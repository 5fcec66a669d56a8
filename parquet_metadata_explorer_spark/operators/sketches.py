"""Deterministic, engine-exact approximate sketches.

Spark's built-in approximations (``approx_count_distinct``'s
HyperLogLog++, ``approx_percentile``'s Greenwald-Khanna) are bounded-
memory and mergeable but their internals cannot be replayed by a second
engine, so they can only ever be rows-only entries on the correctness
board. The sketches here trade a little constant-factor efficiency for
FULL determinism: every hash is the shared 60-bit md5 prefix, every
bucket statistic is integer arithmetic, and every floating-point
reduction follows the repo's round-12 / exact-decimal discipline — so a
DuckDB twin reproduces the ESTIMATE bit-for-bit and the sketch itself
sits on the hash-compare board (the histogram-percentile sketch in
streaming/events.py is the same idea for quantiles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .relational import _round_dec
from ..functions import hash60


def hll_distinct(df: DataFrame, col, b: int = 12) -> DataFrame:
    """HyperLogLog distinct-count estimate (Flajolet et al. 2007) over
    ``col``, fully deterministic: bucket = top ``b`` bits of the 60-bit
    md5 hash, rho = 1-based position of the first 1-bit in the
    remaining 60−b bits (bit length via base-2 string conversion —
    integer-exact on both engines, no log2 boundary hazards), register
    M_j = max(rho). The raw estimate α·m²/Σ2^(−M_j) uses an exact
    decimal sum of round-12 powers of two (empty registers contribute
    exactly 1 each, added as an integer); the small-range correction
    (linear counting m·ln(m/V) when E ≤ 2.5m) snaps ln to 12 decimals.
    Standard error ~1.04/√m (m=4096 → ~1.6%, pytest-asserted).

    Scale shape: ONE partial-aggregating shuffle to m=2^b register rows
    (a repeated value contributes one row per task, like every arg-max
    in this repo), then an m-row fold — the bounded-memory mergeable
    shape of approx_count_distinct, with none of its opacity. Returns
    one row (m, n_registers_used, estimate).
    """
    m = 1 << b
    tail_bits = 60 - b
    c = F.col(col) if isinstance(col, str) else col
    h = hash60(c)
    # integer bit ops only: 60-bit hashes exceed double's 2^53 exactness
    bucket = F.shiftright(h, tail_bits)
    rest = h.bitwiseAND(F.lit((1 << tail_bits) - 1))
    bitlen = F.length(F.conv(rest.cast("string"), 10, 2))
    rho = F.when(rest == 0, F.lit(tail_bits + 1)).otherwise(
        F.lit(tail_bits) - bitlen + 1
    )
    regs = (
        df.filter(c.isNotNull())
        .select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("M"))
    )
    alpha = 0.7213 / (1.0 + 1.079 / m)
    folded = regs.agg(
        F.count("*").cast("long").alias("n_used"),
        F.sum(
            F.round(F.pow(F.lit(0.5), F.col("M")), 12).cast("decimal(30,15)")
        ).alias("s_present"),
    )
    # coalesce: empty/all-null input leaves sum() NULL; 0 routes the
    # fold into the V=m linear-counting branch -> estimate = 0, keeping
    # the numeric-estimate contract on the empty edge (r7 advice)
    s_total = F.coalesce(F.col("s_present").cast("double"), F.lit(0.0)) + (
        F.lit(m) - F.col("n_used")
    ).cast("double")
    e_raw = F.lit(alpha) * F.lit(float(m)) * F.lit(float(m)) / s_total
    v = F.lit(m) - F.col("n_used")
    linear = F.lit(float(m)) * F.round(
        F.log(F.lit(float(m)) / v.cast("double")), 12
    )
    est = F.when((e_raw <= F.lit(2.5 * m)) & (v > 0), linear).otherwise(e_raw)
    return folded.select(
        F.lit(m).cast("long").alias("m"),
        "n_used",
        _round_dec(est, 4).alias("estimate"),
    )
