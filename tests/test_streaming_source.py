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
