"""F3 partition-value type sweep (reference DefaultSourceSuite.scala:61-94).

Values round-trip through Spark-style typed inference and render with Java
``toString`` semantics, so ``ts=2020-02-02 01:02:03`` becomes
``2020-02-02 01:02:03.0`` exactly as the reference golden map expects."""

import pyspark.sql.functions as F
import pytest

import parquet_metadata_explorer_spark as pqx
from parquet_metadata_explorer_spark.listing import (
    _java_double_str,
    render_partition_value,
)


@pytest.fixture(scope="module")
def typed_part_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("typed")) + "/data"
    df = spark.sql(
        """
        SELECT 1 AS id,
               true AS p_bool, 1 AS p_int, 2L AS p_long, 3.3d AS p_double,
               'abc' AS p_str, DATE'2020-01-01' AS p_date,
               TIMESTAMP'2020-02-02 01:02:03' AS p_ts
        """
    )
    df.write.partitionBy(
        "p_bool", "p_int", "p_long", "p_double", "p_str", "p_date", "p_ts"
    ).parquet(d)
    return d


def test_partition_type_stringification(spark, typed_part_dir):
    """End-to-end sweep over a Spark-written partitioned dataset; expected
    values are the reference golden map (DefaultSourceSuite.scala:84-91)."""
    rows = pqx.read_metadata(spark, typed_part_dir, source="file", level="file").collect()
    assert rows
    p = rows[0].partition
    assert p["p_bool"] == "true"
    assert p["p_int"] == "1"
    assert p["p_long"] == "2"
    assert p["p_double"] == "3.3"
    assert p["p_str"] == "abc"
    assert p["p_date"] == "2020-01-01"
    assert p["p_ts"] == "2020-02-02 01:02:03.0"


def test_render_partition_value_goldens():
    """The reference golden table verbatim, plus the renderer's edge rules."""
    # DefaultSourceSuite.scala:84-91
    assert render_partition_value("true") == "true"
    assert render_partition_value("1") == "1"
    assert render_partition_value("2") == "2"
    assert render_partition_value("3.3") == "3.3"
    assert render_partition_value("abc") == "abc"
    assert render_partition_value("2020-01-01") == "2020-01-01"
    assert render_partition_value("2020-02-02 01:02:03") == "2020-02-02 01:02:03.0"
    # java.sql.Timestamp.toString nanos handling
    assert (
        render_partition_value("2020-02-02 01:02:03.123")
        == "2020-02-02 01:02:03.123"
    )
    assert (
        render_partition_value("2020-02-02 01:02:03.120")
        == "2020-02-02 01:02:03.12"
    )
    assert (
        render_partition_value("2020-02-02 01:02:03.000001")
        == "2020-02-02 01:02:03.000001"
    )
    # ISO 'T' separator is accepted by Spark's stringToTimestamp
    assert render_partition_value("2020-02-02T01:02:03") == "2020-02-02 01:02:03.0"
    # invalid date/timestamp components stay verbatim strings
    assert render_partition_value("2020-13-01") == "2020-13-01"
    assert render_partition_value("2020-02-30 01:02:03") == "2020-02-30 01:02:03"
    assert render_partition_value("2020-02-02 25:02:03") == "2020-02-02 25:02:03"
    # not date-shaped at all
    assert render_partition_value("2020-01-01x") == "2020-01-01x"
    # NULL partition passes through
    assert render_partition_value(None) is None


def test_java_double_rendering():
    assert _java_double_str(3.3) == "3.3"
    assert _java_double_str(-3.3) == "-3.3"
    assert _java_double_str(100.0) == "100.0"
    assert _java_double_str(0.001) == "0.001"
    # Java switches to computerized scientific notation at 1e7 and below 1e-3
    assert _java_double_str(1e7) == "1.0E7"
    assert _java_double_str(1.23e8) == "1.23E8"
    assert _java_double_str(1e-4) == "1.0E-4"
    assert _java_double_str(0.0) == "0.0"
    assert _java_double_str(9999999.0) == "9999999.0"
    # double-shaped partition strings normalize ('3.30' -> Double 3.3 -> '3.3')
    assert render_partition_value("3.30") == "3.3"
    assert render_partition_value("1e5") == "100000.0"


def test_null_partition_value(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("nullpart")) + "/data"
    spark.sql(
        "SELECT * FROM VALUES (1, 'a'), (2, CAST(NULL AS STRING)) AS t(id, p)"
    ).write.partitionBy("p").parquet(d)
    rows = pqx.read_metadata(spark, d, source="file", level="file").collect()
    values = {r.partition["p"] for r in rows}
    # __HIVE_DEFAULT_PARTITION__ surfaces as SQL NULL
    assert None in values and "a" in values
