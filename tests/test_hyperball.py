"""HyperBall distance analytics: sketch estimates vs an independent
exact-BFS reference on planted + random graphs (accuracy, not equality —
metrics, never semantics), EXACT forced-tier parity (register max is
order-independent, so per-node outputs must be bit-identical across
tiers), and structural ground truths (star / chain) where harmonic
centrality is known in closed form."""

import dataclasses

import numpy as np
import pandas as pd
import pytest
import ray.data

from blarify_ray.config import DEFAULT_CONFIG
from blarify_ray.ops.hyperball import effective_diameter, hyperball

FORCED = dataclasses.replace(DEFAULT_CONFIG, hyperball_driver_max_edges=0)


def _ds(edges, nodes):
    pairs = ray.data.from_items([{"x": a, "y": b} for a, b in edges]) if edges else (
        ray.data.from_arrow(
            __import__("pyarrow").Table.from_pydict(
                {"x": __import__("pyarrow").array([], "string"),
                 "y": __import__("pyarrow").array([], "string")}
            )
        )
    )
    return pairs, ray.data.from_items([{"node": n} for n in nodes])


def _exact(edges, nodes):
    """Exact per-node (reach, harmonic) by one reverse-BFS per node."""
    radj = {n: [] for n in nodes}
    for a, b in edges:
        radj[b].append(a)  # who reaches b in one step
    reach, harm = {}, {}
    for v in nodes:
        dist = {v: 0}
        frontier = [v]
        d = 0
        while frontier:
            d += 1
            nxt = []
            for u in frontier:
                for w in radj[u]:
                    if w not in dist:
                        dist[w] = d
                        nxt.append(w)
            frontier = nxt
        reach[v] = len(dist)
        harm[v] = sum(1.0 / dd for dd in dist.values() if dd > 0)
    return reach, harm


def _rand_graph(n=80, m=400, seed=7):
    rng = np.random.default_rng(seed)
    nodes = [f"n{i:03d}" for i in range(n)]
    edges = {(nodes[a], nodes[b]) for a, b in rng.integers(0, n, (m, 2)) if a != b}
    return sorted(edges), nodes


def test_hyperball_accuracy_vs_exact_bfs():
    edges, nodes = _rand_graph()
    pairs, nds = _ds(edges, nodes)
    out, rounds = hyperball(pairs, nds, b=12, max_rounds=32)
    got = {r["node"]: (r["reach"], r["harmonic"]) for r in out.take_all()}
    reach, harm = _exact(edges, nodes)
    assert set(got) == set(nodes)
    # b=12 → 4096 registers; balls ≤ 80 sit deep in the linear-counting
    # regime, so per-node error is a few percent at most
    for v in nodes:
        assert got[v][0] == pytest.approx(reach[v], rel=0.06, abs=0.8)
        assert got[v][1] == pytest.approx(harm[v], rel=0.08, abs=0.8)
    # neighborhood function is monotone and ends at Σ reach
    tot = rounds["total_reached"].to_numpy()
    assert (np.diff(tot) >= -1e-9).all()
    assert tot[-1] == pytest.approx(sum(reach.values()), rel=0.05)


def test_forced_tier_bit_parity():
    edges, nodes = _rand_graph(n=50, m=180, seed=11)
    pairs, nds = _ds(edges, nodes)
    d_out, d_rounds = hyperball(pairs, nds, b=8, max_rounds=32)
    pairs2, nds2 = _ds(edges, nodes)
    x_out, x_rounds = hyperball(pairs2, nds2, b=8, max_rounds=32, cfg=FORCED)
    d = {r["node"]: (r["reach"], r["harmonic"]) for r in d_out.take_all()}
    x = {r["node"]: (r["reach"], r["harmonic"]) for r in x_out.take_all()}
    assert d == x  # float-exact: identical register math both tiers
    assert len(d_rounds) == len(x_rounds)
    assert np.allclose(
        d_rounds["total_reached"], x_rounds["total_reached"], rtol=1e-9
    )


def test_star_graph_ground_truth():
    # leaves all point at the hub: hub harmonic = n-1 exactly (all at
    # distance 1), every leaf harmonic = 0, hub reach = n
    n = 40
    nodes = ["hub"] + [f"leaf{i:02d}" for i in range(n - 1)]
    edges = [(leaf, "hub") for leaf in nodes[1:]]
    pairs, nds = _ds(edges, nodes)
    out, rounds = hyperball(pairs, nds, b=12, max_rounds=8)
    got = {r["node"]: r for r in out.take_all()}
    assert got["hub"]["harmonic"] == pytest.approx(n - 1, rel=0.05)
    assert got["hub"]["reach"] == pytest.approx(n, rel=0.05)
    for leaf in nodes[1:]:
        assert got[leaf]["harmonic"] == pytest.approx(0.0, abs=0.2)
    assert effective_diameter(rounds) == 1


def test_chain_effective_diameter_and_early_stop():
    # directed chain n0→n1→…→n9: ball of n_k grows for k rounds;
    # harmonic(n_k) = H_k (harmonic number)
    nodes = [f"n{i}" for i in range(10)]
    edges = [(nodes[i], nodes[i + 1]) for i in range(9)]
    pairs, nds = _ds(edges, nodes)
    out, rounds = hyperball(pairs, nds, b=12, max_rounds=32)
    got = {r["node"]: r for r in out.take_all()}
    for k in range(10):
        hk = sum(1.0 / d for d in range(1, k + 1))
        assert got[nodes[k]]["harmonic"] == pytest.approx(hk, rel=0.05, abs=0.05)
    # early stop: 9 growth rounds, not max_rounds
    assert rounds["t"].iloc[-1] <= 10
    assert effective_diameter(rounds, q=1.0) == rounds["t"].iloc[-1]


def test_empty_and_isolated():
    pairs, nds = _ds([], ["a", "b"])
    out, rounds = hyperball(pairs, nds, b=8, max_rounds=4)
    got = {r["node"]: r for r in out.take_all()}
    assert set(got) == {"a", "b"}
    for v in got.values():
        assert v["harmonic"] == 0.0
        assert v["reach"] == pytest.approx(1.0, rel=0.05)
    assert len(rounds) == 1  # no growth round ran


def test_kg_wrapper_schema():
    import os
    import shutil

    from blarify_ray.pipelines.graph_analytics import (
        distance_distribution,
        top_harmonic,
    )
    from blarify_ray.pipelines.kg_build import build_kg

    out_dir = "/tmp/blarify_ray_test_hb_kg"
    shutil.rmtree(out_dir, ignore_errors=True)
    paths = build_kg(out_dir, 40)
    top = top_harmonic(paths, k=5)
    rows = top.take_all()
    assert 0 < len(rows) <= 5
    assert set(rows[0]) == {"entity_id", "reach", "harmonic"}
    h = [r["harmonic"] for r in rows]
    assert h == sorted(h, reverse=True)
    dist = distance_distribution(paths)
    assert list(dist.columns) == ["t", "total_reached", "frac"]
    assert dist["frac"].iloc[-1] == pytest.approx(1.0)
