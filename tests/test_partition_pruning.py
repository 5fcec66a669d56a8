"""Partition pruning before footer parse: files whose typed partition
values fail the filter are dropped from the scan seed list, so their
footers are NEVER fetched. Proved two ways — a corrupt parquet file in
the pruned-away partition (any footer read of it would fail the query)
and the S16 remote-I/O accumulators (pruned page scans open fewer
streams). Extension beyond the reference, which always lists + parses
everything (MetadataFileFormat.scala:65-67) and filters after."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import parquet_metadata_explorer_spark as pqx
from parquet_metadata_explorer_spark.listing import (
    list_files,
    parse_partition_filter,
    prune_files_by_partition,
)
from parquet_metadata_explorer_spark.metrics import ScanMetrics


@pytest.fixture(scope="module")
def registered(spark):
    pqx.register(spark)


@pytest.fixture(scope="module")
def part_root(tmp_path_factory):
    """date=2020-01-01..03 / k=a,b tree; the 2020-01-03 partition holds a
    CORRUPT .parquet file whose footer read raises — pruning is the only
    way a parquet-level scan over the root can succeed while it's there."""
    root = str(tmp_path_factory.mktemp("pruned"))
    for d in ("2020-01-01", "2020-01-02"):
        for k in ("a", "b"):
            sub = f"{root}/date={d}/k={k}"
            os.makedirs(sub)
            pq.write_table(
                pa.table({"x": [1, 2, 3], "tag": [f"{d}-{k}"] * 3}),
                f"{sub}/part-0.parquet",
            )
    bad = f"{root}/date=2020-01-03/k=a"
    os.makedirs(bad)
    with open(f"{bad}/part-0.parquet", "wb") as f:
        f.write(b"PAR1corrupt-not-a-footer")
    return root


def test_prune_helper_forms(part_root):
    files = list_files(part_root)
    assert len(files) == 5
    eq = prune_files_by_partition(files, {"date": "2020-01-01"})
    assert len(eq) == 2 and all(("date", "2020-01-01") in f.partition for f in eq)
    isin = prune_files_by_partition(files, {"k": ["a", "b"], "date": "2020-01-02"})
    assert len(isin) == 2
    s = prune_files_by_partition(files, "date=2020-01-01|2020-01-02,k=a")
    assert len(s) == 2
    fn = prune_files_by_partition(files, lambda pm: pm["k"] == "b")
    assert len(fn) == 2
    assert parse_partition_filter("a=1,b=x|y") == {"a": "1", "b": ["x", "y"]}
    with pytest.raises(ValueError, match="Not a partition column"):
        prune_files_by_partition(files, {"zzz": "1"})


def test_pruned_scan_never_touches_excluded_footers(spark, registered, part_root):
    """The corrupt file sits in date=2020-01-03: a footer-parsing scan
    over the whole root fails, the pruned scan succeeds — direct proof
    the excluded partition's footer is never read."""
    with pytest.raises(Exception):
        pqx.read_metadata(
            spark, part_root, source="parquet", level="file"
        ).collect()

    rows = pqx.read_metadata(
        spark,
        part_root,
        source="parquet",
        level="file",
        partition_filter={"date": ["2020-01-01", "2020-01-02"]},
    ).collect()
    assert len(rows) == 4
    assert all(r.partition["date"] != "2020-01-03" for r in rows)

    # the option-string form through format("metadata")
    n = (
        spark.read.format("metadata")
        .option("source", "parquet")
        .option("level", "file")
        .option("partitionfilter", "date=2020-01-01|2020-01-02")
        .load(part_root)
        .count()
    )
    assert n == 4


def test_pruned_page_scan_opens_fewer_streams(spark, part_root):
    """S16 metrics accumulators: the page scan opens one stream per file,
    so a date-equality prune must cut remote opens/reads accordingly."""
    full = ScanMetrics(spark)
    pqx.read_metadata(
        spark,
        part_root,
        source="parquet",
        level="page",
        io_metrics=full,
        partition_filter={"date": ["2020-01-01", "2020-01-02"]},
    ).count()
    pruned = ScanMetrics(spark)
    pqx.read_metadata(
        spark,
        part_root,
        source="parquet",
        level="page",
        io_metrics=pruned,
        partition_filter={"date": "2020-01-01"},
    ).count()
    assert 0 < pruned.remote_reads < full.remote_reads


def test_datasource_pushfilters_prunes_files(spark, registered, part_root):
    """With Python-data-source filter pushdown enabled (session conf +
    reader option), a filepath equality in WHERE prunes the seed files at
    plan time: the corrupt file never gets a footer read even with no
    partitionfilter option. Catalyst does not push map-element predicates
    (partition['date'] = ...) to Python sources, so those prune only via
    the partitionfilter option. (With pushdown disabled the filter still
    applies post-scan — pruning is only ever an optimization.)"""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    target = f"{part_root}/date=2020-01-01/k=a/part-0.parquet"
    try:
        df = (
            spark.read.format("metadata")
            .option("source", "parquet")
            .option("level", "file")
            .option("filterpushdown", "true")
            .load(part_root)
            .filter(f"filepath = '{target}'")
        )
        rows = df.collect()
        assert len(rows) == 1
        assert rows[0].partition["date"] == "2020-01-01"
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")


def test_stream_pagecontent_refused(spark, registered, part_root):
    """pagecontent=true on the streaming path would move data bytes
    through the driver; the source must refuse it up front."""
    q = (
        spark.readStream.format("metadata")
        .option("source", "parquet")
        .option("level", "page")
        .option("pagecontent", "true")
        .load(f"{part_root}/date=2020-01-01")
    )
    with pytest.raises(Exception, match="streaming path"):
        (
            q.writeStream.format("memory")
            .queryName("pg_refuse")
            .trigger(availableNow=True)
            .start()
            .awaitTermination(60)
        )


def test_filter_matching_nothing_keeps_level_valid(spark, tmp_path):
    """A partition filter matching zero files must return an EMPTY
    DataFrame of the requested level — not let source inference fall
    back to 'file' and fail level validation."""
    import pyspark.sql.functions as F

    import parquet_metadata_explorer_spark as pqx

    root = str(tmp_path / "part")
    spark.range(10).withColumn("p", F.col("id") % 2).write.partitionBy(
        "p"
    ).parquet(root)
    out = pqx.read_metadata(
        spark, root, level="rowgroup", partition_filter={"p": "99"}
    )
    assert out.count() == 0
    assert "row_group_id" in out.columns


def test_register_enables_pushdown_from_session_conf(spark, part_root):
    """With spark.sql.python.filterPushdown.enabled=true at register()
    time, a plain df.filter prunes at plan time with NO per-read option:
    a rowgroup-level scan filtered to one good file succeeds even though
    the root contains a corrupt parquet file (whose footer read would
    throw if it were parsed)."""
    target = f"{part_root}/date=2020-01-01/k=a/part-0.parquet"
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        pqx.register(spark)  # re-register with the pushdown default
        rows = (
            spark.read.format("metadata")
            .option("source", "parquet")
            .option("level", "rowgroup")
            .load(part_root)
            .filter(f"filepath = '{target}'")
            .collect()
        )
        assert len(rows) == 1 and rows[0].filepath == target
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")
        pqx.register(spark)  # restore the plain default


def test_partitioncolumns_lifts_keys_and_prunes(spark, part_root):
    """partitioncolumns=true lifts discovered keys to top-level part_<key>
    columns; Spark pushes top-level equality to the Python source (it does
    NOT push map elements — measured), so filtering part_date prunes the
    corrupt 2020-01-03 partition before any footer read."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        pqx.register(spark)
        df = (
            spark.read.format("metadata")
            .option("source", "parquet")
            .option("level", "rowgroup")
            .option("partitioncolumns", "true")
            .load(part_root)
            .filter("part_date = '2020-01-01'")
        )
        assert "part_date" in df.columns and "part_k" in df.columns
        rows = df.collect()
        # k=a and k=b, one rowgroup each (rowgroup level has no partition
        # map column — the lifted part_ columns are how partition values
        # reach this level at all)
        assert len(rows) == 2
        assert all(r.part_date == "2020-01-01" for r in rows)
        assert sorted(r.part_k for r in rows) == ["a", "b"]
        assert {r.filepath.split("/k=")[1][0] for r in rows} == {"a", "b"}
    finally:
        spark.conf.set("spark.sql.python.filterPushdown.enabled", "false")
        pqx.register(spark)


def test_partitioncolumns_without_pushdown_still_correct(spark, registered, part_root):
    """partitioncolumns works as plain projected columns when pushdown is
    off (no pruning, same values) — on a root with no corrupt files."""
    sub = f"{part_root}/date=2020-01-01"
    df = (
        spark.read.format("metadata")
        .option("source", "parquet")
        .option("level", "file")
        .option("partitioncolumns", "true")
        .load(sub)
        .filter("part_k = 'b'")
    )
    rows = df.collect()
    assert len(rows) == 1 and rows[0].part_k == "b"


def test_stream_applies_partitionfilter(spark, registered, part_root):
    """The streaming metadata source must prune per micro-batch: with a
    partitionfilter excluding the corrupt 2020-01-03 partition, a
    parquet-level stream over the whole root succeeds and emits only
    matching partitions (without the filter the corrupt footer would
    fail the batch)."""
    import tempfile

    q = (
        spark.readStream.format("metadata")
        .option("source", "parquet")
        .option("level", "file")
        .option("partitionfilter", "date=2020-01-01|2020-01-02")
        .load(part_root)
    )
    run = (
        q.writeStream.format("memory")
        .queryName("stream_pruned")
        .option("checkpointLocation", tempfile.mkdtemp() + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    run.awaitTermination(120)
    rows = spark.table("stream_pruned").collect()
    assert len(rows) == 4  # 2 dates x 2 k values; 2020-01-03 pruned
    assert {r.partition["date"] for r in rows} == {"2020-01-01", "2020-01-02"}


def test_stream_partitioncolumns_emits_lifted_values(spark, registered, part_root):
    """partitioncolumns=true on the STREAM path: the schema gains the
    part_<key> columns AND the stream rows carry their values (a
    schema/row mismatch here would corrupt every emitted row)."""
    import tempfile

    q = (
        spark.readStream.format("metadata")
        .option("source", "parquet")
        .option("level", "file")
        .option("partitionfilter", "date=2020-01-01|2020-01-02")
        .option("partitioncolumns", "true")
        .load(part_root)
    )
    run = (
        q.writeStream.format("memory")
        .queryName("stream_partcols")
        .option("checkpointLocation", tempfile.mkdtemp() + "/ckpt")
        .trigger(availableNow=True)
        .start()
    )
    run.awaitTermination(120)
    rows = spark.table("stream_partcols").collect()
    assert len(rows) == 4
    for r in rows:
        assert r.part_date == r.partition["date"]
        assert r.part_k == r.partition["k"]
