"""Fixed-point PageRank (operators/graph.py): hand-checkable exact
values on tiny graphs, mass conservation bounds, duplicate-edge
weighting, and the DECIMAL(38,0) contribution widening."""

from __future__ import annotations

import pytest

from summit_23_snowpark_data_lake_workloads_spark.operators.graph import (
    DEN_D,
    NUM_D,
    RANK_SCALE,
    pagerank_fixed,
)


def _ranks(spark, edges, iterations=3):
    df = spark.createDataFrame(edges, "src string, dst string")
    return {
        r.node: r.rank
        for r in pagerank_fixed(df, iterations=iterations).collect()
    }


def _expected(edges, iterations):
    """Pure-python replay of the integer fixed-point update."""
    nodes = {n for e in edges for n in e}
    outdeg: dict = {}
    for s, _d in edges:
        outdeg[s] = outdeg.get(s, 0) + 1
    tele = ((DEN_D - NUM_D) * RANK_SCALE) // DEN_D
    r = {n: RANK_SCALE for n in nodes}
    for _ in range(iterations):
        incoming = {n: 0 for n in nodes}
        for s, d in edges:
            incoming[d] += (NUM_D * r[s]) // (DEN_D * outdeg[s])
        r = {n: tele + incoming[n] for n in nodes}
    return r


def test_two_node_cycle_exact(spark):
    edges = [("a", "b"), ("b", "a")]
    for it in (1, 3, 5):
        assert _ranks(spark, edges, it) == _expected(edges, it)


def test_star_and_dangling_exact(spark):
    # hub 'h' feeds 3 leaves (dangling: no out-edges -> mass leaks,
    # the documented non-normalized convention); one leaf points back
    edges = [("h", "x"), ("h", "y"), ("h", "z"), ("x", "h")]
    got = _ranks(spark, edges, 4)
    assert got == _expected(edges, 4)
    # the hub out-ranks the leaves; rank ignores out-edges, so all
    # three leaves (each receiving 1/3 of the hub's mass) tie exactly
    assert got["h"] > got["x"] == got["y"] == got["z"]


def test_duplicate_edges_act_as_weights(spark):
    single = _ranks(spark, [("a", "b"), ("a", "c")], 3)
    # a->b twice: b gets 2/3 of a's mass instead of 1/2
    double = _ranks(spark, [("a", "b"), ("a", "b"), ("a", "c")], 3)
    assert double["b"] > single["b"]
    assert double == _expected([("a", "b"), ("a", "b"), ("a", "c")], 3)


def test_rank_sums_bounded_by_total_mass(spark):
    edges = [(f"n{i}", f"n{(i * 7 + 1) % 23}") for i in range(23)]
    got = _ranks(spark, edges, 5)
    total = 23 * RANK_SCALE
    assert 0 < sum(got.values()) <= total
    assert got == _expected(edges, 5)


def test_contrib_arithmetic_is_decimal(spark):
    """The widened plan: the NUM_D * rank multiply and the contribution
    sum must be DECIMAL(38,0) expressions (the >500k-node headroom),
    not bigint."""
    df = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    plan = (
        pagerank_fixed(df, iterations=1)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert "decimal(38,0)" in plan
