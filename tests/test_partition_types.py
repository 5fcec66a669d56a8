"""F3 partition-value type sweep (reference DefaultSourceSuite.scala:61-94).

Deviation recorded in SURVEY §7 risk 5: values are the URL-decoded path
strings verbatim (no typed round-trip through Java Timestamp.toString), so
`ts=2020-02-02 01:02:03` stays exactly that string."""

import pyspark.sql.functions as F
import pytest

import parquet_metadata_explorer_spark as pqx


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
    rows = pqx.read_metadata(spark, typed_part_dir, source="file", level="file").collect()
    assert rows
    p = rows[0].partition
    assert p["p_bool"] == "true"
    assert p["p_int"] == "1"
    assert p["p_long"] == "2"
    assert p["p_double"] == "3.3"
    assert p["p_str"] == "abc"
    assert p["p_date"] == "2020-01-01"
    # URL-decoded path value, documented deviation from Java
    # Timestamp.toString ('2020-02-02 01:02:03.0')
    assert p["p_ts"].startswith("2020-02-02 01")


def test_null_partition_value(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("nullpart")) + "/data"
    spark.sql(
        "SELECT * FROM VALUES (1, 'a'), (2, CAST(NULL AS STRING)) AS t(id, p)"
    ).write.partitionBy("p").parquet(d)
    rows = pqx.read_metadata(spark, d, source="file", level="file").collect()
    values = {r.partition["p"] for r in rows}
    # __HIVE_DEFAULT_PARTITION__ surfaces as SQL NULL
    assert None in values and "a" in values
