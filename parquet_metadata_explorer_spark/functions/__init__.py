"""Portable column helpers shared by the extension operators.

Everything here compiles to built-in JVM expressions (whole-stage codegen,
no Python UDFs) and has an exact DuckDB-SQL equivalent, so every operator
built on these can be verified against an independent oracle engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dlit(v) -> Column:
    """(Nested) double-array literal built through ONE parsed SQL
    expression string — the cheap constructor for driver-held model
    constants (codebooks, centroids, ADC LUTs) that ride query plans as
    literals.

    Why not ``F.lit(list)``: pyspark implements it as ``array(*[lit(x)
    for x in xs])`` — one py4j round trip per element, ~2 s for a
    2048-double codebook, paid per construction (a Lloyd trainer
    constructs per iteration). The SQL parser builds the identical
    CreateArray tree in-JVM in milliseconds and constant folding
    collapses it to a single array literal before execution.

    Exactness: ``repr(float)`` is the shortest round-trip decimal form,
    so text→parse reproduces every double bit-for-bit; NaN/±Inf render
    as explicit string casts (the SQL lexer has no literal for them).
    Empty arrays carry an explicit cast so the nesting level keeps the
    array<double…> element type."""

    def render(x, depth):
        if isinstance(x, (list, tuple)):
            if not x:
                t = "double"
                for _ in range(depth - 1):
                    t = f"array<{t}>"
                return f"cast(array() as array<{t}>)"
            return (
                "array(" + ",".join(render(e, depth - 1) for e in x) + ")"
            )
        x = float(x)
        if x != x:
            return "cast('NaN' as double)"
        if x == float("inf"):
            return "cast('Infinity' as double)"
        if x == float("-inf"):
            return "cast('-Infinity' as double)"
        return repr(x) + "D"

    def depth_of(x):
        d = 0
        while isinstance(x, (list, tuple)):
            d += 1
            x = x[0] if len(x) else None
        return d

    return F.expr(render(v, depth_of(v)))


def llit(v) -> Column:
    """(Nested) bigint-array literal through one parsed SQL string —
    ``dlit``'s integer sibling (exactness is trivial: longs print and
    parse exactly)."""

    def render(x, depth):
        if isinstance(x, (list, tuple)):
            if not x:
                t = "bigint"
                for _ in range(depth - 1):
                    t = f"array<{t}>"
                return f"cast(array() as array<{t}>)"
            return (
                "array(" + ",".join(render(e, depth - 1) for e in x) + ")"
            )
        return f"{int(x)}L"

    def depth_of(x):
        d = 0
        while isinstance(x, (list, tuple)):
            d += 1
            x = x[0] if len(x) else None
        return d

    return F.expr(render(v, depth_of(v)))


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
