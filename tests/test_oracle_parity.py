"""Spark-vs-DuckDB parity for every query in __spark_entry__.py.

Replicates the driver's correctness gate locally: run each ``queries()``
entry and its ``oracle_sql()`` twin on the same parquet tables, normalize
(sort columns by name, sort rows), and compare values exactly (floats to
1e-9). Runs at sf0.001 for speed; the driver runs the same comparison at
sf0.01.
"""

import decimal
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

# float64 holds 53 mantissa bits; wider exact integers/decimals degrade
# when a client canonicalizes through pandas (DuckDB fetchdf coerces
# DECIMAL and HUGEINT columns to float64; Spark collect keeps exact
# Decimals) — identical exact values then hash DIFFERENTLY client-side.
# This is the one failure class the exact fetchall/collect compare below
# cannot see: corpus_manifest passed every local sweep and went red on
# the r10 driver board exactly this way. Gate it here.
_F64_EXACT_INT = 1 << 53


def assert_client_proof(name, cols, rows, duck_types=None):
    """Every output value must survive a pandas float64 round-trip
    bit-for-bit, or be a type pandas never coerces (int64, string,
    bytes, date). Decimals must be float64-exact; DuckDB HUGEINT
    (sum(BIGINT) left uncast) must stay within 2^53. Non-scalar cells
    (array/map/struct) are banned outright: the driver canonicalizes
    through pandas ``sort_values``, whose hashtable factorize throws
    ``unhashable type: 'list'`` on them — the exact crash that took
    bm25_index_fsck red on the r13 board."""
    for r in rows:
        for i, v in enumerate(r):
            if isinstance(v, (list, tuple, dict, set)) or type(v).__name__ == "Row":
                raise AssertionError(
                    f"{name}.{cols[i]}: non-scalar value {type(v).__name__} — "
                    "pandas sort_values crashes on array/map/struct cells in "
                    "the driver's canonicalizer; array_join/to_json the "
                    "column in the boarded query"
                )
            if isinstance(v, decimal.Decimal):
                assert decimal.Decimal(float(v)) == v, (
                    f"{name}.{cols[i]}: decimal value {v} exceeds float64 "
                    "precision — a pandas-canonicalizing client (the "
                    "driver) coerces one engine's copy to float64 and "
                    "hash-mismatches the other; emit it as a string"
                )
            elif (
                duck_types is not None
                and isinstance(v, int)
                and not isinstance(v, bool)
                and abs(v) > _F64_EXACT_INT
                and "HUGEINT" in str(duck_types[i]).upper()
            ):
                raise AssertionError(
                    f"{name}.{cols[i]}: HUGEINT value {v} > 2^53 — pandas "
                    "coerces HUGEINT to float64; cast the oracle column "
                    "to ::BIGINT or emit a string"
                )


def assert_scalar_schema(name, sdf):
    """Schema-level twin of the non-scalar gate: no array/map/struct
    column may reach a boarded output (driver pandas canonicalizer
    crash class, r13 bm25_index_fsck)."""
    from pyspark.sql import types as T

    for f in sdf.schema.fields:
        assert not isinstance(
            f.dataType, (T.ArrayType, T.MapType, T.StructType)
        ), (
            f"{name}.{f.name}: {f.dataType.simpleString()} column in a "
            "queries() output — the driver's pandas canonicalizer crashes "
            "on non-scalar cells; array_join/to_json it in the query"
        )


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_parity(spark, duck, name):
    sql = ORACLES[name].replace("/root/testdata/sf0.01", SF)
    oracle = duck.sql(sql)
    o_types = oracle.types
    o_rows, o_cols = oracle.fetchall(), [d[0] for d in oracle.description]

    sdf = QUERIES[name](spark, SF)
    assert_scalar_schema(name, sdf)
    s_rows, s_cols = sdf.collect(), sdf.columns

    assert_client_proof(name, o_cols, o_rows, duck_types=o_types)
    assert_client_proof(name, s_cols, s_rows)

    assert sorted(s_cols) == sorted(o_cols), f"{name}: column names differ"
    left, right = normalize(s_rows, s_cols), normalize(o_rows, o_cols)
    assert len(left) == len(right), f"{name}: row count {len(left)} vs oracle {len(right)}"
    mismatches = [(a, b) for a, b in zip(left, right) if a != b]
    assert not mismatches, f"{name}: first mismatch {mismatches[0]}"


def test_client_proof_gate_catches_the_r10_red():
    """The gate must red-flag the exact value class that took
    corpus_manifest down on the r10 board (a 21-significant-digit
    DECIMAL(38,0)), and pass its post-fix string form and ordinary
    float64-exact decimals."""
    wide = decimal.Decimal("296144174162535420451")  # the r10 board value
    with pytest.raises(AssertionError, match="exceeds float64"):
        assert_client_proof("corpus_manifest", ["content_digest"], [(wide,)])
    # post-fix: a string survives any client verbatim
    assert_client_proof("corpus_manifest", ["content_digest"], [(str(wide),)])
    # float64-exact decimals (the snap-discipline outputs) stay legal
    assert_client_proof("x", ["v"], [(decimal.Decimal("0.5"),)])
    # HUGEINT beyond 2^53 is flagged only with the DuckDB type signal
    with pytest.raises(AssertionError, match="HUGEINT"):
        assert_client_proof("x", ["v"], [(1 << 60,)], duck_types=["HUGEINT"])
    assert_client_proof("x", ["v"], [(1 << 60,)], duck_types=["BIGINT"])
    # the r13 red class: a list cell crashes the driver's pandas
    # sort_values; the gate must name it before the board does
    with pytest.raises(AssertionError, match="non-scalar"):
        assert_client_proof("x", ["examples"], [(["a", "b"],)])
    assert_client_proof("x", ["examples"], [("a,b",)])


@pytest.mark.parametrize(
    "name",
    ["events_percentiles_approx", "bm25_index_fsck", "ivfpq_index_verify"],
)
def test_rows_only_client_proof(spark, name):
    """The rows-only seats never pass through test_parity, so the
    non-scalar gate must reach them here: schema- and value-level
    client-proof on each (this is exactly how the r13 array column
    escaped every local sweep and went red on the driver board)."""
    sdf = QUERIES[name](spark, SF)
    assert_scalar_schema(name, sdf)
    rows = sdf.collect()
    assert rows, f"{name}: empty rows-only output"
    assert_client_proof(name, sdf.columns, rows)


def test_all_queries_have_entries():
    # every query has an oracle except THREE deliberate rows-only
    # entries: the approx-percentile scale twin (Spark's
    # Greenwald-Khanna sketch has no bit-identical DuckDB twin;
    # rank-error bound asserted in tests/test_streaming.py) and the
    # two index-fsck seats (r12 BM25, r13 IVF-PQ — their reports
    # derive from index artifacts written to scratch space, invisible
    # to the oracle harness's pre-registered testdata views; exactness
    # evidence is test_fsck.py's planted-corruption matrix).
    # The bloom row gained a relational twin in r8 (deterministic hash
    # + bit-set join) and the dhash row a hex-nibble byte replay — both
    # fully oracled now.
    assert set(QUERIES) - set(ORACLES) == {
        "events_percentiles_approx",
        "bm25_index_fsck",
        "ivfpq_index_verify",
    }


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

def test_board_manifest_matches_registry():
    """BOARD_MANIFEST.json (r13 verdict #8) is the machine-readable
    slot arithmetic SURVEY 2.4's prose cites — it must equal the live
    registry: the current board is its boards.<max round>, the contract
    and off-rotation groups match, and every manifest name resolves."""
    import json

    with open("/root/repo/BOARD_MANIFEST.json") as f:
        man = json.load(f)
    names = list(QUERIES)
    cur = max(man["boards"], key=lambda r: int(r[1:]))
    assert man["boards"][cur] == names[:50]
    assert man["contract_rows"] == names[41:50]
    assert man["off_rotation"] == names[-3:]
    assert set(man["rows_only"]) == set(QUERIES) - set(ORACLES)
    for group in list(man["boards"].values()) + list(man["due"].values()):
        missing = [n for n in group if n not in QUERIES]
        assert not missing, missing
    # capacity identity: board = rotating + contract, exactly full
    p = man["policy"]
    assert len(man["boards"][cur]) == p["board_size"] == (
        p["rotating_slots"] + p["contract_slots"]
    )
