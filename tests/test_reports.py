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
