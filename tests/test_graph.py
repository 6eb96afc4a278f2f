"""Graph operators: PageRank vs a numpy reference, k-hop reachability
vs a dict-BFS closure, and the deterministic edge builder."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from wing_binlog_go_spark.operators.graph import (
    interaction_edges,
    khop_counts,
    pagerank,
)
from wing_binlog_go_spark.tables import read_table


def _ref_pagerank(edges, d=0.85, iters=10):
    nodes = sorted({u for e in edges for u in e})
    ix = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _ in edges:
        out[ix[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, t in edges:
            contrib[ix[t]] += r[ix[s]] / out[ix[s]]
        dangling = r[out == 0].sum()
        r = (1 - d) / n + d * (contrib + dangling / n)
    return {u: r[ix[u]] for u in nodes}


def test_pagerank_matches_numpy_reference(spark):
    """Cycle + spoke + DANGLING sink: ranks match the dense reference
    to 1e-9 and keep summing to 1 (the dangling redistribution)."""
    edges = [(1, 2), (2, 3), (3, 1), (1, 4), (4, 5), (2, 4)]  # 5 dangles
    e = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.rank for r in pagerank(e, damping=0.85, n_iter=10).collect()}
    want = _ref_pagerank(edges)
    assert set(got) == set(want)
    for u in want:
        assert abs(got[u] - want[u]) < 1e-9, u
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_pagerank_sink_gains_cycle_loses(spark):
    """Directional sanity: a node every path feeds into outranks the
    node that only feeds others."""
    e = spark.createDataFrame(
        [(1, 9), (2, 9), (3, 9), (9, 1)], "src long, dst long"
    )
    got = {r.node: r.rank for r in pagerank(e, n_iter=20).collect()}
    assert got[9] == max(got.values())


def test_khop_matches_dict_bfs(spark, sf_small):
    """k-hop closure over the real events-derived graph equals a
    driver-side BFS with the same hop bound (cycles may re-reach the
    start node; that is part of the contract)."""
    ev = read_table(spark, sf_small, "events")
    edges = interaction_edges(ev)
    elist = [(r.src, r.dst) for r in edges.collect()]
    adj = {}
    for s, t in elist:
        adj.setdefault(s, set()).add(t)
    want = {}
    for start in adj:
        seen, frontier = set(), {start}
        for _ in range(3):
            frontier = {t for u in frontier for t in adj.get(u, ())}
            seen |= frontier
        if seen:
            want[start] = len(seen)
    got = {r.node: r.n_reachable for r in khop_counts(edges, k=3).collect()}
    assert want, "fixture graph must be non-empty"
    assert got == want


def test_interaction_edges_deterministic_and_thresholded(spark, sf_small):
    """Edge builder: no self-loops, weights ≥ threshold, and two runs
    agree exactly (window order is keyed on unique event_id)."""
    ev = read_table(spark, sf_small, "events")
    a = {(r.src, r.dst): r.weight for r in interaction_edges(ev, 2).collect()}
    b = {(r.src, r.dst): r.weight for r in interaction_edges(ev, 2).collect()}
    assert a == b and a
    assert all(s != t for s, t in a)
    assert all(w >= 2 for w in a.values())


def test_khop_random_graphs_match_bfs_reference(spark):
    """Hypothesis over random edge lists (self-loops and duplicates
    included — the operator takes arbitrary edges): the iterative
    frontier join equals a dict BFS for k ∈ {1, 2, 3}."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    edge = st.tuples(st.integers(0, 7), st.integers(0, 7))

    @given(edges=st.lists(edge, min_size=1, max_size=25), k=st.integers(1, 3))
    @settings(
        max_examples=12,
        deadline=None,
        suppress_health_check=[HealthCheck.function_scoped_fixture],
    )
    def check(edges, k):
        e = spark.createDataFrame(edges, "src long, dst long")
        got = {r.node: r.n_reachable for r in khop_counts(e, k=k).collect()}
        adj = {}
        for s, t in edges:
            adj.setdefault(s, set()).add(t)
        want = {}
        for start in adj:
            seen, frontier = set(), {start}
            for _ in range(k):
                frontier = {t for u in frontier for t in adj.get(u, ())}
                seen |= frontier
            if seen:
                want[start] = len(seen)
        assert got == want

    check()


def test_graph_degenerate_inputs(spark):
    """Empty graph ranks nothing (no divide-by-zero); k < 1 raises."""
    import pytest

    empty = spark.createDataFrame([], "src long, dst long")
    assert pagerank(empty, n_iter=3).collect() == []
    with pytest.raises(ValueError, match="k must be"):
        khop_counts(empty, k=0)


def test_weighted_pagerank_matches_numpy_reference(spark):
    """Weighted mode distributes rank proportionally to out-edge
    weights (parallel edges sum); matches a dense reference to 1e-9
    and an unweighted run on unit weights exactly."""
    edges = [(1, 2, 3.0), (1, 3, 1.0), (2, 3, 2.0), (3, 1, 5.0), (2, 4, 1.0)]
    e = spark.createDataFrame(edges, "src long, dst long, weight double")
    got = {
        r.node: r.rank
        for r in pagerank(e, n_iter=12, weight_col="weight").collect()
    }
    nodes = sorted({u for s, t, _ in edges for u in (s, t)})
    ix = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    wout = np.zeros(n)
    for s, t, w in edges:
        wout[ix[s]] += w
    r = np.full(n, 1.0 / n)
    for _ in range(12):
        contrib = np.zeros(n)
        for s, t, w in edges:
            contrib[ix[t]] += r[ix[s]] * w / wout[ix[s]]
        dangling = r[wout == 0].sum()
        r = 0.15 / n + 0.85 * (contrib + dangling / n)
    for u in nodes:
        assert abs(got[u] - r[ix[u]]) < 1e-9, u
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # unit weights == unweighted
    unit = e.withColumn("weight", F.lit(1.0))
    a = {r_.node: r_.rank for r_ in pagerank(unit, n_iter=5, weight_col="weight").collect()}
    b = {r_.node: r_.rank for r_ in pagerank(e.select("src", "dst"), n_iter=5).collect()}
    assert a == b


def test_triangle_counts_match_bruteforce_reference(spark):
    """triangle_counts (degree-oriented wedge enumeration) equals a
    pure-Python O(n^3) triangle scan on random graphs, including the
    per-node counts and coefficients; a node of degree < 2 is absent."""
    import itertools
    import random

    from wing_binlog_go_spark.operators.graph import triangle_counts

    rng = random.Random(17)
    for trial in range(3):
        n = 12 + trial * 4
        edges = sorted(
            {
                (a, b)
                for a, b in (
                    sorted(rng.sample(range(n), 2)) for _ in range(3 * n)
                )
            }
        )
        adj = {v: set() for v in range(n)}
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        want = {}
        for v in range(n):
            if len(adj[v]) < 2:
                continue
            t = sum(
                1
                for x, y in itertools.combinations(sorted(adj[v]), 2)
                if y in adj[x]
            )
            d = len(adj[v])
            want[v] = (t, round(2.0 * t / (d * (d - 1)), 6))

        df = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r.node: (r.triangles, r.coeff)
            for r in triangle_counts(df).collect()
        }
        assert got == want, f"trial {trial}"
