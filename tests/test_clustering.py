"""Connected-components correctness: large-star/small-star (distributed
path) and the driver-side union-find fast path must agree with each
other and with a pure-Python reachability oracle on the fixture shapes
of FIXTURES.md §4 (chains, stars, cliques joined by a bridge,
singletons, random graphs)."""

from __future__ import annotations

import random

import pytest


@pytest.fixture(scope="module")
def spark():
    from sz_spark.session import build_session

    s = build_session(master="local[4]", shuffle_partitions=4, app_name="cc-tests")
    yield s
    s.stop()


def oracle_components(edges: list[tuple[str, str]]) -> dict[str, str]:
    """BFS reachability oracle (independent of the union-find impl)."""
    adj: dict[str, set] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    seen, out = set(), {}
    for start in sorted(adj):
        if start in seen:
            continue
        comp, stack = [], [start]
        seen.add(start)
        while stack:
            x = stack.pop()
            comp.append(x)
            for y in adj[x]:
                if y not in seen:
                    seen.add(y)
                    stack.append(y)
        root = min(comp)
        for x in comp:
            out[x] = root
    return out


GRAPHS = {
    "chain": [(f"n{i}", f"n{i+1}") for i in range(20)],
    "star": [("hub", f"s{i}") for i in range(15)],
    "two_cliques_bridge": (
        [(f"a{i}", f"a{j}") for i in range(5) for j in range(i + 1, 5)]
        + [(f"b{i}", f"b{j}") for i in range(5) for j in range(i + 1, 5)]
        + [("a0", "b0")]
    ),
    "self_loops_and_dups": [("x", "x"), ("x", "y"), ("y", "x"), ("x", "y")],
    "random": [
        (f"r{random.Random(7).randrange(200)}", f"r{random.Random(11).randrange(200)}")
    ],
}
rng = random.Random(42)
GRAPHS["random"] = [
    (f"r{rng.randrange(300)}", f"r{rng.randrange(300)}") for _ in range(400)
]


def _assign(spark, edges, **kw):
    from sz_spark.clustering import connected_components

    df = spark.createDataFrame(edges, "src string, dst string")
    out = connected_components(df, **kw)
    return {r["id"]: r["cluster_id"] for r in out.collect()}


@pytest.mark.parametrize("name", sorted(GRAPHS))
def test_local_fast_path_matches_oracle(spark, name):
    edges = GRAPHS[name]
    exp = oracle_components(edges)
    got = _assign(spark, edges)  # small → local union-find path
    exp_nontrivial = {k: v for k, v in exp.items() if k != v}
    got_full = {k: got.get(k, k) for k in exp}
    assert {k: v for k, v in got_full.items()} == exp


@pytest.mark.parametrize("name", ["chain", "two_cliques_bridge", "random"])
def test_distributed_path_matches_oracle(spark, name):
    edges = GRAPHS[name]
    exp = oracle_components(edges)
    got = _assign(spark, edges, local_threshold=0)  # force large/small-star
    got_full = {k: got.get(k, k) for k in exp}
    assert got_full == exp


def test_union_find_local_direct():
    from sz_spark.clustering import union_find_local

    for name, edges in GRAPHS.items():
        exp = oracle_components(edges)
        got = union_find_local(edges)
        got_full = {k: got.get(k, k) for k in exp}
        assert got_full == exp, name
