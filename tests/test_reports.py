"""Dictionary-encoding health report over encoding_stats."""

import pyarrow as pa
import pyarrow.parquet as pq

from parquet_metadata_explorer_spark.operators.reports import dict_encoding_report


def test_testdata_fully_dict_encoded(spark, sf_dir):
    rep = dict_encoding_report(spark, sf_dir)
    rows = rep.collect()
    assert len(rows) > 0
    # arrow-written low-cardinality testdata dictionary-encodes everything
    assert all(r.n_chunks == r.n_dict for r in rows), rows
    assert all(r.overflow_examples == [] for r in rows)


def test_dict_overflow_detected(spark, tmp_path):
    """A tiny dictionary-size limit forces mid-chunk PLAIN fallback, which
    must classify as dict_overflow with the file listed."""
    t = pa.table({"s": [f"value-{i:06d}" for i in range(5000)]})
    p = str(tmp_path / "overflow.parquet")
    pq.write_table(t, p, dictionary_pagesize_limit=1024, data_page_size=4096)
    rep = dict_encoding_report(spark, str(tmp_path)).collect()
    assert len(rep) == 1
    r = rep[0]
    assert r.path == "s"
    assert r.n_overflow == 1 and r.n_dict == 0, r
    assert r.overflow_examples and r.overflow_examples[0].endswith("overflow.parquet")


def test_rowgroup_overlap_report(spark, tmp_path):
    """A file sorted across many row groups must report disjoint ranges
    on the sort column; the same data shuffled must report overlaps."""
    import random

    from parquet_metadata_explorer_spark.operators.reports import (
        rowgroup_overlap_report,
    )

    rng = random.Random(7)
    n = 10_000
    vals = list(range(n))
    t_sorted = pa.table({"k": vals, "s": [f"w{v % 97}" for v in vals]})
    shuffled = vals[:]
    rng.shuffle(shuffled)
    t_shuf = pa.table({"k": shuffled, "s": [f"w{v % 97}" for v in shuffled]})

    d1 = tmp_path / "sorted"
    d2 = tmp_path / "shuffled"
    d1.mkdir(); d2.mkdir()
    pq.write_table(t_sorted, str(d1 / "f.parquet"), row_group_size=1000)
    pq.write_table(t_shuf, str(d2 / "f.parquet"), row_group_size=1000)

    rep1 = {r.path: r for r in rowgroup_overlap_report(spark, str(d1)).collect()}
    assert rep1["k"].n_rowgroups == 10
    assert rep1["k"].n_overlaps == 0 and rep1["k"].range_prunable
    # low-cardinality payload column overlaps everywhere
    assert rep1["s"].n_overlaps > 0 and not rep1["s"].range_prunable

    rep2 = {r.path: r for r in rowgroup_overlap_report(spark, str(d2)).collect()}
    assert rep2["k"].n_overlaps > 0 and not rep2["k"].range_prunable


def test_bloom_probe_roundtrip(spark, tmp_path):
    """Against Spark-written bloom filters: every present key must probe
    True (blooms have no false negatives — this also pins the xxhash64
    and split-block math end-to-end), absent keys are ~all False, and a
    bloom-less file yields NULL."""
    from parquet_metadata_explorer_spark.operators.reports import bloom_probe

    out = str(tmp_path / "bloomed")
    (
        spark.range(0, 4000)
        .selectExpr("concat('key-', id) AS s", "id AS k")
        .coalesce(1)
        .write.option("parquet.bloom.filter.enabled#s", "true")
        .option("parquet.bloom.filter.enabled#k", "true")
        .parquet(out)
    )

    present = [f"key-{i}" for i in range(0, 4000, 100)]
    absent = [f"nope-{i}" for i in range(200)]
    rep = bloom_probe(spark, out, "s", present + absent).collect()
    hits = {r.value: r.might_contain for r in rep}
    assert all(hits[v] is True for v in present)  # no false negatives
    fp = sum(1 for v in absent if hits[v])
    assert fp <= 2, f"false-positive rate implausibly high: {fp}/200"

    # INT64 column probes with typed encoding
    rep_k = {r.value: r.might_contain for r in bloom_probe(spark, out, "k", [5, 4001]).collect()}
    assert rep_k["5"] is True  # present int64 key, typed little-endian hash
    assert rep_k["4001"] is False  # absent (tiny FP chance accepted as flake)

    # file without blooms -> NULL (must-scan)
    out2 = str(tmp_path / "plain")
    spark.range(10).selectExpr("concat('x', id) AS s").write.parquet(out2)
    rep2 = bloom_probe(spark, out2, "s", ["x1"]).collect()
    assert all(r.might_contain is None for r in rep2)


def test_page_pruning_report(spark, tmp_path):
    """On a sorted multi-page column, a narrow BETWEEN must prune most
    pages; the same predicate on shuffled data prunes ~none."""
    import random

    from parquet_metadata_explorer_spark.operators.reports import (
        page_pruning_report,
    )

    vals = list(range(50_000))
    rng = random.Random(3)
    shuffled = vals[:]
    rng.shuffle(shuffled)
    for name, data in [("sorted", vals), ("shuffled", shuffled)]:
        pq.write_table(
            pa.table({"k": data}),
            str(tmp_path / f"{name}.parquet"),
            row_group_size=50_000,
            data_page_size=4096,
            write_page_index=True,
        )
    # an index-less file must still surface (n_pages = 0), not vanish
    pq.write_table(
        pa.table({"k": vals[:100]}),
        str(tmp_path / "noindex.parquet"),
        write_page_index=False,
    )
    rep = {
        r.filepath.rsplit("/", 1)[1]: r
        for r in page_pruning_report(
            spark, str(tmp_path), "k", 1000, 2000
        ).collect()
    }
    s = rep["sorted.parquet"]
    u = rep["shuffled.parquet"]
    assert s.n_pages > 10  # small data pages -> many pages
    assert s.prunable_frac > 0.9, s
    assert u.prunable_frac < 0.1, u
    n = rep["noindex.parquet"]
    assert n.n_pages == 0 and n.n_prunable == 0 and n.prunable_frac is None


def test_schema_drift_report(spark, tmp_path):
    """Two writer-schema vintages in one directory -> two variants with
    correct file counts; a homogeneous dataset -> one."""
    from parquet_metadata_explorer_spark.operators.reports import (
        schema_drift_report,
    )

    for i in range(3):
        pq.write_table(pa.table({"a": [1, 2], "b": ["x", "y"]}),
                       str(tmp_path / f"old_{i}.parquet"))
    pq.write_table(pa.table({"a": [3, 4], "b": ["z", "w"], "c": [0.1, 0.2]}),
                   str(tmp_path / "new_0.parquet"))

    rep = schema_drift_report(spark, str(tmp_path)).collect()
    assert len(rep) == 2
    assert [r.n_files for r in rep] == [3, 1]
    assert rep[0].example_files == [f"old_{i}.parquet" for i in range(3)]
    assert "double c" in rep[1].schema or "c;" in rep[1].schema


def test_reports_tolerate_incomparable_stats(spark, tmp_path):
    """Binary (non-utf8) stats or type-mismatched bounds must degrade to
    unknown/not-prunable — never a task failure."""
    from parquet_metadata_explorer_spark.operators.reports import (
        page_pruning_report,
        rowgroup_overlap_report,
    )

    t = pa.table({"b": [bytes([0xFF, i % 256]) for i in range(1000)]})
    p = str(tmp_path / "bin.parquet")
    pq.write_table(t, p, row_group_size=100, write_page_index=True)

    rep = rowgroup_overlap_report(spark, str(tmp_path)).collect()
    assert len(rep) == 1 and rep[0].n_rowgroups == 10  # ran to completion

    # numeric bounds against a binary column: nothing comparable -> 0 prunable
    pp = page_pruning_report(spark, str(tmp_path), "b", 10, 20).collect()
    assert len(pp) == 1 and pp[0].n_prunable == 0


def test_page_integrity_clean_file(spark, tmp_path):
    """A pyarrow file written WITH page checksums must audit clean; one
    written WITHOUT must report n_with_crc = 0 (not flagged)."""
    from parquet_metadata_explorer_spark.operators.reports import (
        page_integrity_report,
    )

    t = pa.table({"a": list(range(5000)), "s": [f"v{i % 71}" for i in range(5000)]})
    d1 = tmp_path / "with_crc"
    d2 = tmp_path / "no_crc"
    d1.mkdir()
    d2.mkdir()
    pq.write_table(t, str(d1 / "f.parquet"), write_page_checksum=True)
    pq.write_table(t, str(d2 / "f.parquet"), write_page_checksum=False)

    r1 = page_integrity_report(spark, str(d1)).collect()
    assert len(r1) == 1
    assert r1[0].n_pages > 0
    assert r1[0].n_with_crc == r1[0].n_pages, r1
    assert r1[0].n_crc_mismatch == 0
    assert r1[0].mismatch_examples == []

    r2 = page_integrity_report(spark, str(d2)).collect()
    assert r2[0].n_with_crc == 0 and r2[0].n_crc_mismatch == 0


def test_page_integrity_detects_corruption(spark, tmp_path):
    """Flipping one byte INSIDE a page body (located via our own page
    scan, so the header/footer stay valid) must surface as exactly that
    page's checksum mismatching."""
    from parquet_metadata_explorer_spark.operators.reports import (
        page_integrity_report,
    )
    from parquet_metadata_explorer_spark.sources.api import read_metadata

    t = pa.table({"a": list(range(5000)), "s": [f"v{i % 71}" for i in range(5000)]})
    d = tmp_path / "corrupt"
    d.mkdir()
    path = str(d / "f.parquet")
    pq.write_table(t, path, write_page_checksum=True)

    pages = read_metadata(spark, str(d), source="parquet", level="page").collect()
    victim = next(
        p
        for p in pages
        if p.page_type in ("DATA_PAGE", "DATA_PAGE_V2") and p.page_compressed_size > 8
    )
    body_off = victim.page_header_offset + victim.page_header_size + 4
    with open(path, "r+b") as f:
        f.seek(body_off)
        b = f.read(1)
        f.seek(body_off)
        f.write(bytes([b[0] ^ 0xFF]))

    rep = page_integrity_report(spark, str(d)).collect()
    assert len(rep) == 1
    r = rep[0]
    assert r.n_crc_mismatch == 1, r
    assert len(r.mismatch_examples) == 1
    ex = r.mismatch_examples[0]
    assert (ex.row_group_id, ex.column_id, ex.page_id) == (
        victim.row_group_id,
        victim.column_id,
        victim.page_id,
    )


def test_stats_pruned_read(spark, tmp_path):
    """A range query over a 10-file sorted dataset must (a) admit only
    the files whose stat ranges intersect and (b) return exactly the
    full-scan result."""
    from parquet_metadata_explorer_spark.operators.reports import (
        prunable_files,
        stats_pruned_read,
    )

    d = tmp_path / "ranged"
    d.mkdir()
    for i in range(10):
        t = pa.table({"k": list(range(i * 100, i * 100 + 100)), "tag": [i] * 100})
        pq.write_table(t, str(d / f"f{i}.parquet"))

    admitted = [r.filepath for r in prunable_files(spark, str(d), "k", 250, 420).collect()]
    assert sorted(p.rsplit("/", 1)[1] for p in admitted) == [
        "f2.parquet",
        "f3.parquet",
        "f4.parquet",
    ]

    got = sorted(
        r.k for r in stats_pruned_read(spark, str(d), "k", 250, 420).collect()
    )
    assert got == list(range(250, 421))

    # fully out-of-range: no file admitted, empty result, schema intact
    none = stats_pruned_read(spark, str(d), "k", 5000, 6000)
    assert none.count() == 0
    assert set(none.columns) == {"k", "tag"}


def test_pruned_read_from_cached_metadata(spark, tmp_path):
    """A materialized metadata table must drive file admission WITHOUT
    touching the data lake: admission from the cached catalog equals
    admission from a live scan, even after the original files are gone."""
    import shutil

    from parquet_metadata_explorer_spark.operators.reports import prunable_files
    from parquet_metadata_explorer_spark.sources.api import read_metadata

    d = tmp_path / "lake"
    d.mkdir()
    for i in range(6):
        t = pa.table({"k": list(range(i * 50, i * 50 + 50))})
        pq.write_table(t, str(d / f"f{i}.parquet"))

    catalog = str(tmp_path / "catalog")
    read_metadata(spark, str(d), source="parquet", level="column").write.parquet(
        catalog
    )
    live = sorted(
        r.filepath for r in prunable_files(spark, str(d), "k", 60, 160).collect()
    )

    shutil.rmtree(d)  # the lake is gone; the catalog must suffice
    cached = sorted(
        r.filepath
        for r in prunable_files(
            spark, None, "k", 60, 160, metadata_df=spark.read.parquet(catalog)
        ).collect()
    )
    assert cached == live
    assert [p.rsplit("/", 1)[1] for p in cached] == [
        "f1.parquet",
        "f2.parquet",
        "f3.parquet",
    ]


def test_layout_report_advice(spark, tmp_path):
    """The compaction advisor flags small files and short row groups
    from the rowgroup metadata alone, and its counts reconcile with the
    data."""
    from parquet_metadata_explorer_spark.operators.reports import layout_report

    # tiny file, one row group -> 'compact' under any realistic threshold
    pq.write_table(pa.table({"a": list(range(100))}),
                   str(tmp_path / "small.parquet"))
    # many short row groups -> 'rewrite' once the size bar is passed
    pq.write_table(pa.table({"a": list(range(5000))}),
                   str(tmp_path / "shortrg.parquet"), row_group_size=50)

    rep = {r.filename: r for r in layout_report(
        spark, str(tmp_path), small_file_bytes=64 * 1024 * 1024
    ).collect()}
    assert rep["small.parquet"].advice == "compact"
    assert rep["small.parquet"].n_rows == 100
    assert rep["small.parquet"].n_rowgroups == 1

    # drop the size bar so the short-row-group verdict becomes reachable
    rep2 = {r.filename: r for r in layout_report(
        spark, str(tmp_path), small_file_bytes=1, min_rowgroup_rows=1000
    ).collect()}
    assert rep2["shortrg.parquet"].advice == "rewrite"
    assert rep2["shortrg.parquet"].n_rowgroups == 100
    assert rep2["shortrg.parquet"].avg_rowgroup_rows == 50.0
    assert rep2["small.parquet"].advice == "rewrite"  # 100-row group

    big = {r.filename: r for r in layout_report(
        spark, str(tmp_path), small_file_bytes=1, min_rowgroup_rows=10
    ).collect()}
    assert big["small.parquet"].advice == "ok"
