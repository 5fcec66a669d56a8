"""Physical-plan inspection helpers.

Used by tests (and interactively) to assert the plans are the ones a
100 TB deployment needs: broadcast joins where dims are small, filters
pushed into parquet scans, whole-stage codegen covering the hot
expressions, and no unexpected shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def simple_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle exchanges in the physical plan (AQE may collapse
    some at runtime; this is the static plan count)."""
    plan = simple_plan(df)
    return plan.count("Exchange hashpartitioning") + plan.count(
        "Exchange rangepartitioning"
    )


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in simple_plan(df) or "BroadcastNestedLoopJoin" in simple_plan(df)


def pushed_filters(df: DataFrame) -> str:
    """The PushedFilters section of a parquet scan, empty string if none."""
    plan = formatted_plan(df)
    out = []
    for line in plan.splitlines():
        if "PushedFilters" in line:
            out.append(line.strip())
    return "\n".join(out)
