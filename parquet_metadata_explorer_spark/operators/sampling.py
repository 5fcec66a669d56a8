"""Deterministic sampling & splitting for training-data pipelines.

Random sampling is useless for reproducible corpus work — the same doc
must land in the same split on every run, on every cluster, in every
engine. Everything here keys on ``hash60`` (md5-derived, engine-portable)
so Spark and the DuckDB oracle agree bit-for-bit, and re-runs are stable
under repartitioning.

All map-only or single-shuffle shapes:
- ``hash_split``: zero shuffles — a pure projection; at 100 TB it costs
  one md5 per row.
- ``sample_per_group``: one shuffle on the group key for the row_number
  window; the sort is per-group and spillable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import hash60


def hash_split(
    df: DataFrame, key_col: str, val_permille: int = 100
) -> DataFrame:
    """Add a deterministic ``split`` column: 'val' for rows whose
    ``hash60(key) % 1000 < val_permille``, else 'train'.

    The standard reproducible train/val split: membership depends only on
    the key, so adding data never moves an existing document across
    splits. DuckDB twin:
    ``CASE WHEN ('0x'||substr(md5(key),1,15))::bigint % 1000 < p ...``.
    """
    bucket = hash60(F.col(key_col).cast("string")) % 1000
    return df.withColumn(
        "split", F.when(bucket < val_permille, "val").otherwise("train")
    )


def sample_per_group(
    df: DataFrame, group_col: str, key_col: str, n: int
) -> DataFrame:
    """Deterministic stratified sample: the ``n`` rows with smallest
    ``hash60(key)`` per group — a fixed-size per-stratum sample that is
    stable across runs and engines (ties on the hash break by key).

    One shuffle on ``group_col``; skewed strata cost a spillable sort,
    never memory.
    """
    h = hash60(F.col(key_col).cast("string"))
    rn = F.row_number().over(
        Window.partitionBy(group_col).orderBy(h, F.col(key_col))
    )
    return df.withColumn("sample_rank", rn).filter(
        F.col("sample_rank") <= n
    )
