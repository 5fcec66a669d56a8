"""Metadata-derived health reports — analyses the reference's users run
by hand over the metadata DataFrame, packaged as operators.

Everything here is plain expressions over ``read_metadata`` scans, so a
report over 10^6 files costs one footer pass (no data bytes touched) and
whatever tiny aggregation follows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.api import read_metadata

_DICT_ENCODINGS = ("RLE_DICTIONARY", "PLAIN_DICTIONARY")


def dict_encoding_report(spark: SparkSession, data_path: str) -> DataFrame:
    """Per-column dictionary-encoding health across a dataset.

    Classifies every column chunk from its ``encoding_stats`` (footer
    field id 13, no page reads):

    - ``dict``: a dictionary page exists and every data page is
      dictionary-encoded — the chunk reads at full dictionary speed;
    - ``dict_overflow``: a dictionary page exists but some data pages
      fell back to PLAIN — the writer's dictionary-size limit overflowed
      mid-chunk, the classic silent read-perf regression (fix: raise
      ``parquet.dictionary.page.size`` or lower the row-group size);
    - ``plain``: no dictionary page at all;
    - ``unknown``: the writer emitted no encoding_stats.

    Returns one row per column path: chunk counts per class plus the
    affected files for the overflow class (capped at 10 examples).
    """
    cols = read_metadata(spark, data_path, source="parquet", level="column")
    es = F.col("encoding_stats")
    has_dict_page = F.exists(es, lambda s: s["page_type"] == "DICTIONARY_PAGE")
    data_dict = F.forall(
        F.filter(es, lambda s: s["page_type"].isin("DATA_PAGE", "DATA_PAGE_V2")),
        lambda s: s["encoding"].isin(*_DICT_ENCODINGS),
    )
    status = (
        F.when(es.isNull(), F.lit("unknown"))
        .when(has_dict_page & data_dict, F.lit("dict"))
        .when(has_dict_page, F.lit("dict_overflow"))
        .otherwise(F.lit("plain"))
    )
    classified = cols.select("path", "filepath", status.alias("status"))
    return (
        classified.groupBy("path")
        .agg(
            F.count("*").cast("long").alias("n_chunks"),
            F.sum((F.col("status") == "dict").cast("long")).alias("n_dict"),
            F.sum((F.col("status") == "dict_overflow").cast("long")).alias(
                "n_overflow"
            ),
            F.sum((F.col("status") == "plain").cast("long")).alias("n_plain"),
            F.sum((F.col("status") == "unknown").cast("long")).alias("n_unknown"),
            F.slice(
                F.sort_array(
                    F.collect_set(
                        F.when(F.col("status") == "dict_overflow", F.col("filepath"))
                    )
                ),
                1,
                10,
            ).alias("overflow_examples"),
        )
        .orderBy("path")
    )
