"""connected_components vs a Python union-find reference.

The operator is the large-star/small-star alternation (O(log n) rounds);
the reference is exact, so any structural disagreement fails. Cases cover
the convergence-hostile shapes: a long chain (maximum diameter — naive
label propagation would need 64 rounds), a high-degree star, duplicate
and reversed edges, self-loops, and a seeded random multigraph.
"""

import random

import pytest
from pyspark.sql import functions as F

from parquet_metadata_explorer_spark.operators.graph import (
    connected_components,
)


def uf_components(edges):
    nodes = sorted({x for e in edges if e[0] != e[1] for x in e})
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        if a == b:
            continue
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return sorted(
        (n, min(members)) for members in comp.values() for n in members
    )


CASES = {
    "single_pair": [(1, 2)],
    "chain_64": [(i, i + 1) for i in range(64)],
    "star_hub": [(10, v) for v in range(11, 40)],
    "two_components_plus_selfloop": [
        (1, 2),
        (2, 3),
        (10, 11),
        (10, 12),
        (5, 5),
    ],
    "dups_and_reversed": [(3, 1), (1, 3), (2, 1), (7, 9), (9, 7)],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_matches_union_find(spark, name):
    edges = CASES[name]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = sorted(
        (r["node"], r["component"])
        for r in connected_components(df).collect()
    )
    assert got == uf_components(edges)


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    edges = [(rng.randrange(300), rng.randrange(300)) for _ in range(500)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = sorted(
        (r["node"], r["component"])
        for r in connected_components(df).collect()
    )
    assert got == uf_components(edges)


def test_empty_edges(spark):
    df = spark.createDataFrame([], "src long, dst long")
    assert connected_components(df).count() == 0


def test_component_is_min_member(spark):
    """The canonical representative is the minimum id of its component —
    the determinism contract downstream dedup relies on."""
    df = spark.createDataFrame(
        [(50, 40), (40, 30), (60, 50)], "src long, dst long"
    )
    rows = connected_components(df).collect()
    assert {r["component"] for r in rows} == {30}
    assert sorted(r["node"] for r in rows) == [30, 40, 50, 60]


def test_string_node_ids(spark):
    """Node ids only need to be orderable; string ids work unchanged."""
    df = spark.createDataFrame(
        [("b", "c"), ("a", "b"), ("x", "y")], "src string, dst string"
    )
    got = sorted(
        (r["node"], r["component"])
        for r in connected_components(df).collect()
    )
    assert got == [
        ("a", "a"),
        ("b", "a"),
        ("c", "a"),
        ("x", "x"),
        ("y", "x"),
    ]


def test_driver_fast_path_equals_distributed(spark):
    """The small-graph union-find fast path must return EXACTLY the
    distributed star rounds' output (same nodes, same min-id
    components) — asserted on a random graph by forcing both paths."""
    import random

    rng = random.Random(97)
    edges = [
        (rng.randrange(400), rng.randrange(400)) for _ in range(600)
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    fast = sorted(
        (r["node"], r["component"])
        for r in connected_components(df).collect()
    )
    dist = sorted(
        (r["node"], r["component"])
        for r in connected_components(df, small_graph_edges=0).collect()
    )
    assert fast == dist and fast
