"""Portable column helpers shared by the extension operators.

Everything here compiles to built-in JVM expressions (whole-stage codegen,
no Python UDFs) and has an exact DuckDB-SQL equivalent, so every operator
built on these can be verified against an independent oracle engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash60(col: Column) -> Column:
    """Deterministic 60-bit hash of a string column.

    First 15 hex chars of md5 parsed as an integer — portable: DuckDB
    equivalent is ``('0x' || substr(md5(x),1,15))::bigint``. Used instead of
    ``xxhash64``/``hash`` because those are engine-specific.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def normalize_text(col: Column) -> Column:
    """Lowercase, strip non-alphanumerics to single spaces, trim.

    DuckDB: ``trim(regexp_replace(lower(x), '[^a-z0-9]+', ' ', 'g'))``.
    """
    return F.trim(F.regexp_replace(F.lower(col), "[^a-z0-9]+", " "))


def tokens(col: Column) -> Column:
    """Whitespace tokens of normalized text (array<string>, no empties).

    DuckDB: ``str_split(normalize_text, ' ')`` after the same normalize —
    the normalize collapses runs, so a single-space split is identical.
    """
    norm = normalize_text(col)
    return F.filter(F.split(norm, " "), lambda x: x != "")


def word_shingles(toks: Column, k: int) -> Column:
    """Distinct k-word shingles joined by single spaces.

    DuckDB: ``list_distinct(list_transform(range(1, len - k + 2),
    i -> array_to_string(toks[i:i+k-1], ' ')))`` (1-based inclusive slices).
    """
    n = F.size(toks)
    # guard: Spark's sequence(1, 0) counts DOWN ([1, 0]), so clamp the stop
    # to 1 and blank the result for docs shorter than k tokens
    shingles = F.transform(
        F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    empty = F.array_except(shingles, shingles)
    return F.array_distinct(F.when(n >= k, shingles).otherwise(empty))


def dot(x: Column, y: Column) -> Column:
    """Left-to-right double dot product of two array columns — matches
    DuckDB's ``list_dot_product(x::DOUBLE[], y::DOUBLE[])`` exactly."""
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity between two array<float/double> columns.

    For pairwise scans prefer precomputing ``sqrt(dot(v, v))`` per side
    once (see similarity.py) — this convenience form recomputes both norms
    per pair.
    """
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def ensure_parallelism(df, min_factor: int = 1):
    """Repartition up to the cluster's default parallelism when the input
    has fewer partitions.

    CPU-bound operators (minhash, pairwise cosine, pandas decode) are
    otherwise serialized by small file counts: a single 100 MB parquet file
    arrives as ONE partition and pins one core while 31 idle. At real
    scale inputs already exceed ``defaultParallelism`` and this is a no-op
    — the guard never down-partitions.
    """
    if df.isStreaming:  # micro-batch partitioning is the trigger's job
        return df
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism * min_factor
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
