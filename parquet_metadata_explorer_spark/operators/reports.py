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


def page_pruning_report(
    spark: SparkSession,
    data_path: str,
    column: str,
    lo,
    hi,
) -> DataFrame:
    """How many data pages would a ``column BETWEEN lo AND hi`` predicate
    skip, per file? Answered from the page index alone (ColumnIndex
    min/max per page, ``read_page_index``) — the finest pruning
    granularity parquet offers, one positioned index read per chunk and
    zero data pages touched.

    A page is prunable when its [min, max] is disjoint from [lo, hi]
    (null-only pages always prune). Files written without a page index
    (or without this column) report ``n_pages = 0`` — distinguishable
    from "index present but nothing prunable" (n_pages > 0,
    n_prunable = 0); the report always emits one row per file.
    """
    import pandas as pd

    from ..parquet.decode import decode_stat_value
    from ..sources.api import read_page_index

    idx = read_page_index(spark, data_path)
    cols = read_metadata(spark, data_path, source="parquet", level="column").select(
        "filepath", "row_group_id", "column_id", "path", "type"
    )
    rows = idx.join(cols, ["filepath", "row_group_id", "column_id"]).filter(
        F.col("path") == column
    )
    all_files = cols.select("filepath").distinct()

    def analyze(pdf: pd.DataFrame) -> pd.DataFrame:
        fp = pdf["filepath"].iloc[0]
        typ = pdf["type"].iloc[0]
        n = len(pdf)
        prunable = 0
        for r in pdf.itertuples(index=False):
            if r.null_page:
                prunable += 1
                continue
            mn = decode_stat_value(r.min_value, typ)
            mx = decode_stat_value(r.max_value, typ)
            if mn is None or mx is None:
                continue
            try:
                if mx < lo or mn > hi:
                    prunable += 1
            except TypeError:
                continue  # bounds not comparable with this column's type
        return pd.DataFrame(
            {
                "filepath": [fp],
                "n_pages": [n],
                "n_prunable": [prunable],
                "prunable_frac": [round(prunable / n, 4) if n else None],
            }
        )

    report = rows.groupBy("filepath").applyInPandas(
        analyze,
        "filepath string, n_pages long, n_prunable long, prunable_frac double",
    )
    # index-less (or column-less) files would otherwise vanish from the
    # output; re-join the file universe so they surface as n_pages = 0
    return all_files.join(report, "filepath", "left").select(
        "filepath",
        F.coalesce("n_pages", F.lit(0)).alias("n_pages"),
        F.coalesce("n_prunable", F.lit(0)).alias("n_prunable"),
        "prunable_frac",
    )


def bloom_probe(
    spark: SparkSession, data_path: str, column: str, values: list
) -> DataFrame:
    """Which files/row groups can possibly contain each value? Probes the
    column's split-block bloom filters (``parquet/bloom.py``) — ~1 MiB of
    filter per chunk instead of the data pages, the file-skipping
    primitive for point lookups over a 10^6-file fleet.

    One task per slice of files (same ``parallelize`` shape as the
    metadata scans); each task reads footer + filter once and probes all
    ``values`` against it. Rows with ``might_contain`` NULL mean the
    chunk has no bloom filter (written without one) — it must be scanned.
    A False is definitive (blooms have no false negatives); a True means
    "scan this one".
    """
    from ..listing import list_files
    from ..parquet.bloom import read_bloom_filter
    from ..parquet.footer import read_footer

    files = list_files(data_path, spark=spark)
    vals = list(values)

    def probe(f):
        meta, _ = read_footer(f.path, f.size)
        for rg_id, rg in enumerate(meta.row_groups):
            for col in rg.columns:
                if ".".join(p for p in col.path_in_schema if p) != column:
                    continue
                from ..parquet.thrift import PHYSICAL_TYPES

                typ = PHYSICAL_TYPES[col.type] if col.type is not None else None
                bf = read_bloom_filter(f.path, col)
                for v in vals:
                    hit = bf.might_contain(v, typ) if bf is not None else None
                    yield (f.path, rg_id, str(v), hit)

    rdd = spark.sparkContext.parallelize(files, max(1, min(len(files), 200)))
    return spark.createDataFrame(
        rdd.flatMap(probe),
        "filepath string, row_group_id int, value string, might_contain boolean",
    )


def layout_report(
    spark: SparkSession,
    data_path: str,
    small_file_bytes: int = 64 * 1024 * 1024,
    min_rowgroup_rows: int = 10_000,
) -> DataFrame:
    """Per-file physical-layout health — the compaction advisor that
    turns the metadata plane into a maintenance TODO list.

    One ROWGROUP-level footer scan (no data bytes) yields, per file:
    row-group count, row count, compressed/uncompressed bytes, the mean
    rows per row group, and an ``advice`` verdict:

    - ``compact``  — the file's compressed payload is under
      ``small_file_bytes``: it belongs merged with siblings
      (``sinks.compact_files`` is the fix; at 10^5+ files the listing
      and per-file open overhead dominate scan cost);
    - ``rewrite``  — file is large enough but its row groups average
      under ``min_rowgroup_rows`` rows, so scan parallelism and
      page/rowgroup pruning granularity suffer;
    - ``ok``       — neither pathology.

    All emitted values are exact integer aggregates (plus one
    round-2 mean), so the report is bit-reproducible on any engine —
    the DuckDB oracle replays it from ``parquet_metadata()``.
    """
    rg = read_metadata(spark, data_path, source="parquet", level="rowgroup")
    per_file = (
        rg.groupBy(
            F.element_at(F.split("filepath", "/"), -1).alias("filename")
        )
        .agg(
            F.count("*").cast("long").alias("n_rowgroups"),
            F.sum("num_rows").cast("long").alias("n_rows"),
            F.sum("total_compressed_size").cast("long").alias(
                "compressed_bytes"
            ),
            F.sum("total_uncompressed_size").cast("long").alias(
                "uncompressed_bytes"
            ),
        )
        .withColumn(
            # the repo's exact-decimal mean discipline: decimal
            # quotient, round, THEN the double cast — bit-identical on
            # any engine (the Lloyd-trainer idiom)
            "avg_rowgroup_rows",
            F.round(
                F.col("n_rows").cast("decimal(30,10)")
                / F.col("n_rowgroups"),
                2,
            ).cast("double"),
        )
    )
    advice = (
        F.when(
            F.col("compressed_bytes") < F.lit(int(small_file_bytes)),
            F.lit("compact"),
        )
        .when(
            F.col("avg_rowgroup_rows") < F.lit(int(min_rowgroup_rows)),
            F.lit("rewrite"),
        )
        .otherwise(F.lit("ok"))
    )
    return per_file.withColumn("advice", advice).orderBy("filename")


def schema_drift_report(spark: SparkSession, data_path: str) -> DataFrame:
    """Schema variants across a dataset's files — the fleet-health check
    for datasets written by many jobs over time. Groups files by their
    exact parquet schema string (the S19 ``message …`` printer, so two
    files agree iff their physical schemas are byte-identical) and
    reports each variant's file count, writer, and mtime span. One
    footer-level scan; >1 output row means readers need merged-schema
    handling (or the pipeline has a stray writer).
    """
    files = read_metadata(spark, data_path, source="parquet", level="file")
    return (
        files.groupBy(F.md5("schema").alias("schema_fp"))
        .agg(
            F.count("*").cast("long").alias("n_files"),
            F.first("schema").alias("schema"),
            F.sort_array(F.collect_set("created_by")).alias("writers"),
            F.min("mtime").alias("first_mtime"),
            F.max("mtime").alias("last_mtime"),
            F.slice(F.sort_array(F.collect_set("filename")), 1, 5).alias(
                "example_files"
            ),
        )
        .orderBy(F.desc("n_files"))
    )


def rowgroup_overlap_report(spark: SparkSession, data_path: str) -> DataFrame:
    """Per (file, column): do the row groups' [min, max] statistic ranges
    overlap, or is the file effectively sorted on that column?

    Disjoint ranges mean a predicate prunes row groups (readers skip by
    footer stats alone); heavy overlap means every row group must be
    scanned — the layout signal behind sort/Z-order decisions. Reported
    per column: row-group count, count of overlapping adjacent range
    pairs after sorting by min (0 ⇔ disjoint ⇔ range-prunable), and the
    declared-sorted flag from ``sorting_columns`` so "declared but not
    actually disjoint" files stand out.

    Executes as ``applyInPandas`` over (filepath, path) groups of the
    footer-level metadata — tiny rows (one per row group × column), so
    even a 10^6-file fleet is a small shuffle; no data pages are read.
    """
    import pandas as pd

    from ..parquet.decode import decode_stat_value

    cols = read_metadata(spark, data_path, source="parquet", level="column")
    rgs = read_metadata(spark, data_path, source="parquet", level="rowgroup")
    # column_id -> declared-sort flag via the rowgroup's sorting_columns
    declared = rgs.select(
        "filepath",
        "row_group_id",
        F.coalesce(
            F.transform(F.col("sorting_columns"), lambda s: s["column_idx"]),
            F.array().cast("array<int>"),
        ).alias("sorted_cols"),
    )
    stats = cols.join(declared, ["filepath", "row_group_id"]).select(
        "filepath",
        "path",
        "type",
        "row_group_id",
        F.col("statistics.min_value").alias("mn"),
        F.col("statistics.max_value").alias("mx"),
        F.array_contains(F.col("sorted_cols"), F.col("column_id")).alias(
            "declared_sorted"
        ),
    )

    def analyze(pdf: pd.DataFrame) -> pd.DataFrame:
        fp, path = pdf["filepath"].iloc[0], pdf["path"].iloc[0]
        typ = pdf["type"].iloc[0]
        ranges = [
            (decode_stat_value(r.mn, typ), decode_stat_value(r.mx, typ))
            for r in pdf.itertuples(index=False)
        ]
        have = [r for r in ranges if r[0] is not None and r[1] is not None]
        overlaps = None
        if len(have) == len(ranges):
            try:
                have.sort()
                overlaps = sum(
                    1 for a, b in zip(have, have[1:]) if b[0] <= a[1] and len(have) > 1
                )
            except TypeError:
                # mixed decodability (some BYTE_ARRAY stats utf-8, some
                # raw bytes) -> not comparable; report unknown, not a
                # task failure
                overlaps = None
        return pd.DataFrame(
            {
                "filepath": [fp],
                "path": [path],
                "n_rowgroups": [len(ranges)],
                "n_overlaps": [overlaps],
                "range_prunable": [None if overlaps is None else overlaps == 0],
                "declared_sorted": [bool(pdf["declared_sorted"].any())],
            }
        )

    out_schema = (
        "filepath string, path string, n_rowgroups long, n_overlaps long, "
        "range_prunable boolean, declared_sorted boolean"
    )
    return stats.groupBy("filepath", "path").applyInPandas(analyze, out_schema)


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


def page_integrity_report(spark: SparkSession, data_path: str) -> DataFrame:
    """Per-file page-checksum audit: recompute every data/dictionary
    page's CRC-32 from its raw bytes and compare against the footer-level
    checksum the writer recorded in the page header.

    The parquet spec (parquet-format PageHeader.crc) defines the checksum
    as standard CRC-32 over the page's on-disk bytes EXCLUDING the
    header — exactly the ``page_content`` column the page-level scan
    already materializes, so the whole audit is ``F.crc32`` (JVM
    whole-stage codegen, the same polynomial) over the existing
    distributed page scan: no Python in the hot path, parallelism is
    per-file like every other level. The header field is a SIGNED i32 of
    the checksum's low 32 bits; normalize both sides to unsigned before
    comparing.

    Returns one row per file: pages seen, pages carrying a checksum,
    mismatches, and up to 10 (rowgroup, column, page) example triples
    for the mismatching pages. ``n_crc_mismatch > 0`` means bit rot,
    truncation, or an in-place rewrite — the file should be quarantined.
    Writers that never emit checksums (``n_with_crc = 0``) are reported,
    not flagged.
    """
    from ..sources.api import read_metadata

    pages = read_metadata(
        spark, data_path, source="parquet", level="page", pagecontent=True
    )
    # low 32 bits, unsigned, of both the recorded and recomputed CRC
    recorded = F.col("crc").cast("long").bitwiseAND(F.lit(0xFFFFFFFF))
    computed = F.crc32(F.col("page_content")).bitwiseAND(F.lit(0xFFFFFFFF))
    checked = pages.select(
        "filepath",
        "row_group_id",
        "column_id",
        "page_id",
        F.col("crc").isNotNull().alias("has_crc"),
        (F.col("crc").isNotNull() & (recorded != computed)).alias("mismatch"),
    )
    return (
        checked.groupBy("filepath")
        .agg(
            F.count("*").cast("long").alias("n_pages"),
            F.sum(F.col("has_crc").cast("long")).alias("n_with_crc"),
            F.sum(F.col("mismatch").cast("long")).alias("n_crc_mismatch"),
            F.slice(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            F.col("mismatch"),
                            F.struct("row_group_id", "column_id", "page_id"),
                        )
                    )
                ),
                1,
                10,
            ).alias("mismatch_examples"),
        )
        .orderBy("filepath")
    )


def prunable_files(
    spark: SparkSession,
    data_path: str,
    column: str,
    lo,
    hi,
    metadata_df: DataFrame = None,
) -> DataFrame:
    """Files whose footer statistics ADMIT rows with ``column`` in
    [lo, hi] — the metadata half of a stats-pruned read.

    Runs distributed: the column-level scan's raw min/max stat bytes are
    decoded (same typed decoder as the overlap report) and compared in
    an Arrow pass, then ONE tiny groupBy(filepath) folds rowgroup
    verdicts into a per-file keep/skip. A file is kept when ANY row
    group's [min, max] intersects [lo, hi] — or when stats are absent
    (no stats ⇒ must not prune; absence of evidence is not absence of
    rows). Only the kept file list (metadata-sized) reaches the driver.

    ``metadata_df`` is the catalog path: pass a previously materialized
    column-level metadata DataFrame (e.g. written to a parquet table by
    an ingest job) and admission runs WITHOUT listing or footer-reading
    the data lake at all — on a 10^6-file table the per-query cost
    drops from a million footer fetches to one scan of a small
    metadata table. This is the reference's own motivation ("metadata
    available as a DataFrame so you can query it") taken to its
    conclusion: the metadata DataFrame IS the file-pruning index.
    """
    import pandas as pd

    from ..parquet.decode import decode_stat_value
    from ..sources.api import read_metadata

    cols = (
        metadata_df
        if metadata_df is not None
        else read_metadata(spark, data_path, source="parquet", level="column")
    ).filter(F.col("path") == column)
    slim = cols.select(
        "filepath",
        "type",
        F.col("statistics.min_value").alias("mn"),
        F.col("statistics.max_value").alias("mx"),
    )

    def admit(batches):
        for pdf in batches:
            keep = []
            for r in pdf.itertuples(index=False):
                mn = decode_stat_value(r.mn, r.type)
                mx = decode_stat_value(r.mx, r.type)
                if mn is None or mx is None:
                    keep.append(True)  # unprunable without stats
                else:
                    try:
                        keep.append(not (mx < lo or mn > hi))
                    except TypeError:
                        keep.append(True)  # incomparable -> never prune
            yield pd.DataFrame({"filepath": pdf["filepath"], "keep": keep})

    return (
        slim.mapInPandas(admit, "filepath string, keep boolean")
        .groupBy("filepath")
        .agg(F.max("keep").alias("keep"))
        .filter(F.col("keep"))
        .select("filepath")
    )


def stats_pruned_read(
    spark: SparkSession, data_path: str, column: str, lo, hi
) -> DataFrame:
    """Metadata-driven scan pruning — the synergy the metadata plane
    exists for: answer ``SELECT … WHERE column BETWEEN lo AND hi`` while
    OPENING only the files whose footer stats admit matches.

    Spark's own parquet reader prunes ROW GROUPS inside each file it
    opens, but it still lists/opens every file's footer at scan time;
    this operator moves that decision into the (cacheable, queryable)
    metadata DataFrame — on a 10^6-file table a date-range query plans
    from the metadata scan and touches only the admitted files. The
    residual BETWEEN filter stays on the read (stats admit false
    positives; correctness never depends on the pruning), and row-group
    pruning inside admitted files still happens via the pushed filter.
    """
    files = [r.filepath for r in prunable_files(spark, data_path, column, lo, hi).collect()]
    col = F.col(column)
    if not files:
        return (
            spark.read.parquet(data_path)
            .filter(F.lit(False))
            .filter(col.between(lo, hi))
        )
    return spark.read.parquet(*files).filter(col.between(lo, hi))


def stream_integrity_audit(
    spark: SparkSession,
    data_path: str,
    out_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Continuous ingest validation: watch a landing directory with the
    streaming metadata source (file level — one row per NEW file per
    micro-batch, checkpoint-exact replay) and, per trigger, run the page
    CRC-32 audit on EXACTLY the newly arrived files, appending one audit
    row per file to ``out_path``.

    This is the ``foreachBatch`` shape: the audit is a batch aggregation
    (groupBy filepath over a page scan) that Structured Streaming cannot
    express incrementally, and foreachBatch hands each micro-batch over
    the full batch API — the discovery stays streaming (incremental,
    restart-safe via the checkpoint), the per-file work stays the
    already-tested batch operator. Micro-batches are new-files-sized, so
    the driver-side path collection is bounded by ingest rate, never by
    table size. Returns the started StreamingQuery.
    """
    from .. import register as _register
    from pyspark.sql import functions as SF

    _register(spark)
    files_stream = (
        spark.readStream.format("metadata").option("level", "file").load(data_path)
    )

    def audit(batch_df, batch_id):
        paths = sorted(r.filepath for r in batch_df.select("filepath").collect())
        if not paths:
            return
        report = page_integrity_report(spark, paths[0])
        for p in paths[1:]:
            report = report.unionByName(page_integrity_report(spark, p))
        (
            report.withColumn("batch_id", SF.lit(batch_id).cast("long"))
            .write.mode("append")
            .parquet(out_path)
        )

    writer = files_stream.writeStream.foreachBatch(audit).option(
        "checkpointLocation", checkpoint
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def profile_columns(
    df: DataFrame, numeric_cols: list, string_cols: list
) -> DataFrame:
    """Single-pass column profiler: per column — value/null/distinct
    counts plus min/max (numeric columns as doubles, string columns
    lexicographic) — the data-quality summary every ingest pipeline
    runs first.

    ALL metrics fold in ONE aggregation over the table: Catalyst plans
    the multi-column DISTINCT aggregates with one Expand (rows
    multiplied by the distinct-column count, each partial-aggregated
    map-side), so the table is scanned once regardless of how many
    columns are profiled. The single wide result row is then unpivoted
    to long format driver-side — metrics-count rows, never data rows.
    Min/max stay typed (numeric vs string columns report in separate
    columns) because cross-engine double→string rendering is not
    deterministic, while doubles and ASCII orderings are.
    """
    aggs = []
    for c in numeric_cols + string_cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__n"),
            (F.count(F.lit(1)) - F.count(F.col(c))).alias(f"{c}__nn"),
            F.countDistinct(F.col(c)).alias(f"{c}__nd"),
        ]
    for c in numeric_cols:
        aggs += [
            F.min(F.col(c)).cast("double").alias(f"{c}__mn"),
            F.max(F.col(c)).cast("double").alias(f"{c}__mx"),
        ]
    for c in string_cols:
        aggs += [
            F.min(F.col(c)).cast("string").alias(f"{c}__smn"),
            F.max(F.col(c)).cast("string").alias(f"{c}__smx"),
        ]
    wide = df.agg(*aggs)
    rows = []
    for c in numeric_cols + string_cols:
        is_num = c in numeric_cols
        rows.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col(f"{c}__n").cast("long").alias("n_values"),
                F.col(f"{c}__nn").cast("long").alias("n_null"),
                F.col(f"{c}__nd").cast("long").alias("n_distinct"),
                (F.col(f"{c}__mn") if is_num else F.lit(None).cast("double")).alias(
                    "min_num"
                ),
                (F.col(f"{c}__mx") if is_num else F.lit(None).cast("double")).alias(
                    "max_num"
                ),
                (F.col(f"{c}__smn") if not is_num else F.lit(None).cast("string")).alias(
                    "min_str"
                ),
                (F.col(f"{c}__smx") if not is_num else F.lit(None).cast("string")).alias(
                    "max_str"
                ),
            )
        )
    return (
        wide.select(F.explode(F.array(*rows)).alias("p"))
        .select("p.*")
        .orderBy("column")
    )
