"""Betweenness centrality: driver tier vs an INDEPENDENT in-test
implementation (all-pairs path counting via per-source BFS DAG DP, no
code shared with the engine), forced-tier parity, sampled determinism,
directed semantics, and degenerate inputs."""

from collections import deque
from dataclasses import replace

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from blarify_ray.config import DEFAULT_CONFIG
from blarify_ray.ops.betweenness import betweenness_sampled


def _independent_bc(edges, nodes, directed):
    """Textbook accumulation written independently: for each source,
    BFS distances + path counts, then explicit per-target dependency
    back-propagation (NOT Brandes' single-sweep formulation)."""
    adj = {v: [] for v in nodes}
    for x, y in edges:
        adj[x].append(y)
        if not directed:
            adj[y].append(x)
    bc = {v: 0.0 for v in nodes}
    for s in nodes:
        dist = {s: 0}
        sigma = {s: 1.0}
        order = []
        q = deque([s])
        while q:
            v = q.popleft()
            order.append(v)
            for w in adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    q.append(w)
                if dist[w] == dist[v] + 1:
                    sigma[w] = sigma.get(w, 0.0) + sigma[v]
        # dependency of v for source s: sum over targets t of
        # sigma_st(v)/sigma_st — computed target-by-target
        for t in order:
            if t == s:
                continue
            # walk the BFS DAG backward from t accumulating, per node,
            # the fraction of s->t shortest paths that pass through it
            frac = {t: 1.0}
            for v in reversed(order):
                if v not in frac:
                    continue
                for u in nodes:
                    if dist.get(u, -9) == dist.get(v, -8) - 1 and v in adj[u]:
                        frac[u] = frac.get(u, 0.0) + frac[v] * sigma[u] / sigma[v]
            for v, f in frac.items():
                if v != s and v != t:
                    bc[v] += f
    return bc


def _edges_ds(pairs):
    return rd.from_pandas(
        pd.DataFrame({"x": [p[0] for p in pairs], "y": [p[1] for p in pairs]})
    )


def _as_map(ds):
    rows = ds.take_all()
    return {r["node"]: r["bc"] for r in rows}


def test_exact_equals_independent_undirected(ray_session):
    rng = np.random.RandomState(3)
    nodes = list(range(10))
    pairs = sorted({tuple(sorted(rng.choice(10, 2, replace=False))) for _ in range(18)})
    got = _as_map(betweenness_sampled(_edges_ds(pairs), k_sources=100, seed=1))
    want = _independent_bc(pairs, sorted({n for p in pairs for n in p}), directed=False)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_exact_equals_independent_directed(ray_session):
    pairs = [(0, 1), (1, 2), (2, 3), (0, 4), (4, 3), (3, 5), (1, 4)]
    got = _as_map(
        betweenness_sampled(_edges_ds(pairs), k_sources=100, seed=1, directed=True)
    )
    want = _independent_bc(pairs, list(range(6)), directed=True)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9), v


def test_star_center_dominates(ray_session):
    pairs = [(0, i) for i in range(1, 8)]
    got = _as_map(betweenness_sampled(_edges_ds(pairs), k_sources=100))
    assert got[0] > 0 and all(got[i] == 0.0 for i in range(1, 8))
    # star center: every ordered leaf pair routes through it: 7*6 paths
    assert got[0] == pytest.approx(42.0)


def test_forced_tier_parity(ray_session):
    rng = np.random.RandomState(11)
    pairs = sorted({tuple(sorted(rng.choice(14, 2, replace=False))) for _ in range(30)})
    driver = _as_map(betweenness_sampled(_edges_ds(pairs), k_sources=5, seed=7))
    forced = replace(DEFAULT_CONFIG, graph_driver_max_edges=0)
    dist = _as_map(
        betweenness_sampled(_edges_ds(pairs), k_sources=5, seed=7, cfg=forced)
    )
    assert set(driver) == set(dist)
    for v in driver:
        assert dist[v] == pytest.approx(driver[v], rel=1e-9, abs=1e-9), v


def test_sampled_deterministic_and_scaled(ray_session):
    pairs = [(i, i + 1) for i in range(12)]
    a = _as_map(betweenness_sampled(_edges_ds(pairs), k_sources=4, seed=5))
    b = _as_map(betweenness_sampled(_edges_ds(pairs), k_sources=4, seed=5))
    assert a == b
    c = _as_map(betweenness_sampled(_edges_ds(pairs), k_sources=4, seed=6))
    assert set(a) == set(c)  # same node universe, sources may differ


def test_empty_and_selfloop(ray_session):
    assert betweenness_sampled(_edges_ds([]), k_sources=4).count() == 0
    got = _as_map(betweenness_sampled(_edges_ds([(1, 1), (1, 2)]), k_sources=10))
    assert got == {1: 0.0, 2: 0.0}


def test_string_node_ids(ray_session):
    pairs = [("a", "b"), ("b", "c"), ("c", "d")]
    driver = _as_map(betweenness_sampled(_edges_ds(pairs), k_sources=10, seed=2))
    forced = replace(DEFAULT_CONFIG, graph_driver_max_edges=0)
    dist = _as_map(
        betweenness_sampled(_edges_ds(pairs), k_sources=10, seed=2, cfg=forced)
    )
    assert driver == {"a": 0.0, "b": 4.0, "c": 4.0, "d": 0.0}
    for v in driver:
        assert dist[v] == pytest.approx(driver[v], abs=1e-9)
