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
