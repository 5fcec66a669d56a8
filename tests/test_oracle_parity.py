"""Spark-vs-DuckDB parity for every query in __spark_entry__.py.

Replicates the driver's correctness gate locally: run each ``queries()``
entry and its ``oracle_sql()`` twin on the same parquet tables, normalize
(sort columns by name, sort rows), and compare values exactly (floats to
1e-9). Runs at sf0.001 for speed; the driver runs the same comparison at
sf0.01.
"""

import glob
import math
import sys

import duckdb
import pytest

sys.path.insert(0, "/root/repo")
import __spark_entry__ as entrymod

import os

SF = os.environ.get("PQX_PARITY_SF", "/root/testdata/sf0.001")
TABLES = [p.rsplit("/", 1)[1][:-8] for p in glob.glob(f"{SF}/*.parquet")]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con


def normalize(rows, cols):
    """Sort columns by name, then rows; stringify with float rounding."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])

    def norm_val(v):
        if isinstance(v, float):
            if math.isnan(v):
                return "nan"
            return f"{v:.9g}"
        if isinstance(v, (bytes, bytearray)):
            return v.hex()
        return str(v)

    return sorted(tuple(norm_val(r[i]) for i in order) for r in rows)


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_parity(spark, duck, name):
    sql = ORACLES[name].replace("/root/testdata/sf0.01", SF)
    oracle = duck.sql(sql)
    o_rows, o_cols = oracle.fetchall(), [d[0] for d in oracle.description]

    sdf = QUERIES[name](spark, SF)
    s_rows, s_cols = sdf.collect(), sdf.columns

    assert sorted(s_cols) == sorted(o_cols), f"{name}: column names differ"
    left, right = normalize(s_rows, s_cols), normalize(o_rows, o_cols)
    assert len(left) == len(right), f"{name}: row count {len(left)} vs oracle {len(right)}"
    mismatches = [(a, b) for a, b in zip(left, right) if a != b]
    assert not mismatches, f"{name}: first mismatch {mismatches[0]}"


def test_all_queries_have_entries():
    # every query has an oracle except ONE deliberate rows-only entry:
    # the approx-percentile scale twin (Spark's Greenwald-Khanna sketch
    # has no bit-identical DuckDB twin; rank-error bound asserted in
    # tests/test_streaming.py). The bloom row gained a relational twin
    # in r8 (deterministic hash + bit-set join) and the dhash row a
    # hex-nibble byte replay — both fully oracled now.
    assert set(QUERIES) - set(ORACLES) == {"events_percentiles_approx"}


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


def test_bench_headline_names_resolve():
    """Every bench.py headline query must exist in the registry — a
    renamed entry must not silently break the driver's bench run."""
    import ast
    import pathlib

    src = pathlib.Path("/root/repo/bench.py").read_text()
    tree = ast.parse(src)
    headline = None
    for node in ast.walk(tree):
        if isinstance(node, ast.Assign) and any(
            getattr(t, "id", None) == "headline" for t in node.targets
        ):
            headline = [ast.literal_eval(e) for e in node.value.elts]
    assert headline, "bench.py headline list not found"
    missing = [n for n in headline if n not in QUERIES]
    assert not missing, missing
