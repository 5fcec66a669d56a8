"""Streaming metadata source: readStream.format("metadata") emits rows
for new files per microbatch, with offset-exact replay across restarts."""

import shutil
import tempfile

import parquet_metadata_explorer_spark as pqx

SF = "/root/testdata/sf0.001"


def _run_batch(spark, root, ck, out, level="file"):
    q = (
        spark.readStream.format("metadata")
        .option("level", level)
        .load(root)
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", out)
        .option("checkpointLocation", ck)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.read.parquet(out)


def test_stream_emits_only_new_files(spark):
    pqx.register(spark)
    root = tempfile.mkdtemp()
    base = tempfile.mkdtemp()
    ck, out = base + "/ckpt", base + "/out"
    shutil.copy(f"{SF}/nation.parquet", root + "/nation.parquet")

    out1 = _run_batch(spark, root, ck, out)
    assert [r.filename for r in out1.collect()] == ["nation.parquet"]

    # a new file lands; the restarted query (same checkpoint) emits ONLY
    # the new file — the sink accumulates both
    shutil.copy(f"{SF}/region.parquet", root + "/region.parquet")
    out2 = _run_batch(spark, root, ck, out)
    assert sorted(r.filename for r in out2.collect()) == [
        "nation.parquet",
        "region.parquet",
    ]

    # third run with nothing new: no duplicate emissions
    out3 = _run_batch(spark, root, ck, out)
    assert out3.count() == 2


def test_stream_rowgroup_level_parses_footers(spark):
    pqx.register(spark)
    root = tempfile.mkdtemp()
    base = tempfile.mkdtemp()
    shutil.copy(f"{SF}/lineitem.parquet", root + "/lineitem.parquet")
    out = _run_batch(spark, root, base + "/ckpt", base + "/out", level="rowgroup")
    rows = out.collect()
    assert len(rows) >= 1
    assert all(r.num_rows > 0 for r in rows)
    # streamed rows equal the batch scan of the same directory
    batch = pqx.read_metadata(spark, root, source="parquet", level="rowgroup").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, batch))


def test_stream_integrity_audit_incremental(spark, tmp_path):
    """Continuous ingest validation: the first trigger audits the clean
    landed file; after a corrupted file lands, the restarted query audits
    ONLY the new file and flags exactly its broken page."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_metadata_explorer_spark.operators.reports import (
        stream_integrity_audit,
    )
    from parquet_metadata_explorer_spark.sources.api import read_metadata

    root = str(tmp_path / "landing")
    out = str(tmp_path / "audit_out")
    ck = str(tmp_path / "ckpt")
    import os

    os.makedirs(root)

    t = pa.table({"a": list(range(4000)), "s": [f"v{i % 61}" for i in range(4000)]})
    pq.write_table(t, root + "/clean.parquet", write_page_checksum=True)

    q = stream_integrity_audit(spark, root, out, ck)
    q.awaitTermination(120)
    first = spark.read.parquet(out).collect()
    assert len(first) == 1
    assert first[0].filepath.endswith("clean.parquet")
    assert first[0].n_crc_mismatch == 0 and first[0].n_with_crc == first[0].n_pages

    # a corrupted file lands: write with checksums, flip one page byte
    bad = root + "/bad.parquet"
    pq.write_table(t, bad, write_page_checksum=True)
    page = next(
        p
        for p in read_metadata(spark, bad, source="parquet", level="page").collect()
        if p.page_type in ("DATA_PAGE", "DATA_PAGE_V2") and p.page_compressed_size > 8
    )
    off = page.page_header_offset + page.page_header_size + 2
    with open(bad, "r+b") as f:
        f.seek(off)
        b = f.read(1)
        f.seek(off)
        f.write(bytes([b[0] ^ 0x55]))

    q2 = stream_integrity_audit(spark, root, out, ck)
    q2.awaitTermination(120)
    rows = {r.filepath.rsplit("/", 1)[1]: r for r in spark.read.parquet(out).collect()}
    assert set(rows) == {"clean.parquet", "bad.parquet"}
    assert rows["bad.parquet"].n_crc_mismatch == 1
    assert rows["bad.parquet"].batch_id > rows["clean.parquet"].batch_id
