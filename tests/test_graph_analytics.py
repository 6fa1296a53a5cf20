"""Whole-graph analytics (PageRank, weakly-connected components) over a
small built KG: spec checks against an independent in-test
implementation, plus forced-tier parity (driver numpy vs distributed
rounds must agree to float-summation-order tolerance)."""

import dataclasses
import shutil

import numpy as np
import pytest

from blarify_ray.config import DEFAULT_CONFIG
from blarify_ray.pipelines.graph_analytics import (
    component_sizes,
    pagerank,
    top_pagerank,
    weakly_connected_components,
)
from blarify_ray.pipelines.kg_build import build_kg
from blarify_ray.state.manifest import read_stage

N = 60
OUT = "/tmp/blarify_ray_test_ga"
DAMPING = 0.85
ITERS = 10


@pytest.fixture(scope="module")
def built():
    shutil.rmtree(OUT, ignore_errors=True)
    return build_kg(OUT, N)


def _graph(paths):
    ents = sorted(
        r["entity_id"] for r in read_stage(paths["entities"], columns=["entity_id"]).take_all()
    )
    edges = read_stage(paths["edges"], columns=["src_id", "dst_id", "weight"]).take_all()
    return ents, edges


def _reference_pagerank(ents, edges):
    """Independent spec implementation (plain dict/numpy, no shared code
    with the operator)."""
    idx = {e: i for i, e in enumerate(ents)}
    n = len(ents)
    out_w = np.zeros(n)
    for e in edges:
        out_w[idx[e["src_id"]]] += e["weight"]
    rank = np.full(n, 1.0 / n)
    for _ in range(ITERS):
        inflow = np.zeros(n)
        for e in edges:
            s = idx[e["src_id"]]
            if out_w[s] > 0:
                inflow[idx[e["dst_id"]]] += rank[s] * e["weight"] / out_w[s]
        dangling = rank[out_w == 0].sum()
        rank = (1 - DAMPING) / n + DAMPING * (inflow + dangling / n)
    return {e: rank[i] for e, i in idx.items()}


def test_pagerank_matches_reference(built):
    ents, edges = _graph(built)
    want = _reference_pagerank(ents, edges)
    got = {
        r["entity_id"]: r["rank"]
        for r in pagerank(built, damping=DAMPING, iters=ITERS).take_all()
    }
    assert set(got) == set(want)
    g = np.array([got[e] for e in ents])
    w = np.array([want[e] for e in ents])
    np.testing.assert_allclose(g, w, rtol=1e-9)
    assert abs(g.sum() - 1.0) < 1e-9  # rank is a distribution


def test_pagerank_forced_tier_parity(built):
    driver = {
        r["entity_id"]: r["rank"]
        for r in pagerank(built, damping=DAMPING, iters=ITERS).take_all()
    }
    forced = dataclasses.replace(DEFAULT_CONFIG, pagerank_driver_max_edges=0)
    dist = {
        r["entity_id"]: r["rank"]
        for r in pagerank(built, damping=DAMPING, iters=ITERS, cfg=forced).take_all()
    }
    assert set(dist) == set(driver)
    keys = sorted(driver)
    np.testing.assert_allclose(
        np.array([dist[k] for k in keys]),
        np.array([driver[k] for k in keys]),
        rtol=1e-9,
    )


def test_top_pagerank_named_and_ordered(built):
    rows = top_pagerank(built, k=10).take_all()
    assert 0 < len(rows) <= 10
    assert all(r["name"] for r in rows)
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)


def _reference_wcc(ents, edges):
    parent = {e: e for e in ents}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for e in edges:
        a, b = find(e["src_id"]), find(e["dst_id"])
        if a != b:
            parent[max(a, b)] = min(a, b)
    # component label = min member id
    comp = {}
    for e in ents:
        comp.setdefault(find(e), []).append(e)
    return {m: min(ms) for ms in comp.values() for m in ms}


def test_wcc_matches_union_find(built):
    ents, edges = _graph(built)
    want = _reference_wcc(ents, edges)
    got = {
        r["entity_id"]: r["component"]
        for r in weakly_connected_components(built).take_all()
    }
    assert got == want


def test_component_sizes_sum_to_entity_count(built):
    ents, _ = _graph(built)
    rows = component_sizes(built, k=10_000).take_all()
    assert sum(r["n_members"] for r in rows) == len(ents)
    sizes = [(r["n_members"], r["component"]) for r in rows]
    assert sizes == sorted(sizes, key=lambda s: (-s[0], s[1]))


def _reference_ppr(ents, edges, seeds):
    idx = {e: i for i, e in enumerate(ents)}
    n = len(ents)
    out_w = np.zeros(n)
    for e in edges:
        out_w[idx[e["src_id"]]] += e["weight"]
    tele = np.zeros(n)
    si = [idx[s] for s in sorted(set(seeds)) if s in idx]
    tele[si] = 1.0 / len(si)
    rank = tele.copy()
    for _ in range(ITERS):
        inflow = np.zeros(n)
        for e in edges:
            s = idx[e["src_id"]]
            if out_w[s] > 0:
                inflow[idx[e["dst_id"]]] += rank[s] * e["weight"] / out_w[s]
        dangling = rank[out_w == 0].sum()
        rank = (1 - DAMPING) * tele + DAMPING * (inflow + dangling * tele)
    return {e: rank[i] for e, i in idx.items()}


def test_personalized_pagerank_matches_reference_and_tiers(built):
    ents, edges = _graph(built)
    seeds = [edges[0]["src_id"], edges[-1]["dst_id"]]
    want = _reference_ppr(ents, edges, seeds)
    got = {
        r["entity_id"]: r["rank"]
        for r in pagerank(built, damping=DAMPING, iters=ITERS, seeds=seeds).take_all()
    }
    keys = sorted(want)
    np.testing.assert_allclose(
        np.array([got[k] for k in keys]), np.array([want[k] for k in keys]), rtol=1e-9
    )
    # mass concentrates near the seeds vs uniform PageRank
    assert sum(got[s] for s in set(seeds)) > 2.0 / len(ents)
    forced = dataclasses.replace(DEFAULT_CONFIG, pagerank_driver_max_edges=0)
    dist = {
        r["entity_id"]: r["rank"]
        for r in pagerank(
            built, damping=DAMPING, iters=ITERS, seeds=seeds, cfg=forced
        ).take_all()
    }
    np.testing.assert_allclose(
        np.array([dist[k] for k in keys]), np.array([got[k] for k in keys]), rtol=1e-9
    )


def test_ppr_nonexistent_seed_empty_both_tiers(built):
    """A seed id absent from the graph must yield an EMPTY result in both
    tiers (the driver tier used to divide by a zero-length seed set)."""
    ghost = ["f" * 32]
    assert pagerank(built, seeds=ghost).take_all() == []
    forced = dataclasses.replace(DEFAULT_CONFIG, pagerank_driver_max_edges=0)
    assert pagerank(built, seeds=ghost, cfg=forced).take_all() == []


def test_pagerank_driver_tier_gated_on_node_count(built):
    """An entity-heavy/edge-sparse KG must not select the driver tier on
    edge count alone: forcing the NODE bound to 0 must route to the
    distributed tier and still produce the same ranks."""
    driver = {
        r["entity_id"]: r["rank"]
        for r in pagerank(built, damping=DAMPING, iters=ITERS).take_all()
    }
    forced = dataclasses.replace(DEFAULT_CONFIG, pagerank_driver_max_nodes=0)
    dist = {
        r["entity_id"]: r["rank"]
        for r in pagerank(built, damping=DAMPING, iters=ITERS, cfg=forced).take_all()
    }
    keys = sorted(driver)
    np.testing.assert_allclose(
        np.array([dist[k] for k in keys]),
        np.array([driver[k] for k in keys]),
        rtol=1e-9,
    )


def test_related_entities_excludes_seeds(built):
    from blarify_ray.pipelines.graph_analytics import related_entities
    from blarify_ray.state.manifest import read_stage

    edge = read_stage(built["edges"]).take(1)[0]
    seeds = [edge["src_id"]]
    rows = related_entities(built, seeds, k=10).take_all()
    assert rows and all(r["entity_id"] not in seeds for r in rows)
    ranks = [r["rank"] for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    assert all(r["name"] for r in rows)


def test_path_between_shortest_and_valid(built):
    from blarify_ray.pipelines.graph_analytics import path_between

    ents, edges = _graph(built)
    adj = {}
    edge_set = set()
    for e in edges:
        adj.setdefault(e["src_id"], set()).add(e["dst_id"])
        edge_set.add((e["src_id"], e["dst_id"]))
    # pick a pair with a known BFS distance >= 2
    from collections import deque

    src = edges[0]["src_id"]
    dist = {src: 0}
    q = deque([src])
    while q:
        u = q.popleft()
        for v in adj.get(u, ()):
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    far = [n for n, d in dist.items() if d >= 2]
    assert far, "test graph too shallow"
    dst = sorted(far, key=lambda n: (-dist[n], n))[0]
    steps = path_between(built, src, dst, max_depth=8)
    assert steps, "path must be found"
    assert len(steps) == dist[dst]  # BFS-shortest
    assert steps[0]["src_id"] == src and steps[-1]["dst_id"] == dst
    for s in steps:
        assert (s["src_id"], s["dst_id"]) in edge_set  # every step is a real edge
    for a, b in zip(steps, steps[1:]):
        assert a["dst_id"] == b["src_id"]  # contiguous
    # unreachable / trivial cases
    assert path_between(built, src, src) == []
    assert path_between(built, src, "0" * 32, max_depth=3) == []
    # a path discovered in the round that CROSSES the broadcast cap is
    # still returned (reconstruction runs before the size-cap abort):
    # cap = |seen| after the penultimate round, so the final round both
    # finds dst and exceeds the cap
    cap = sum(1 for d in dist.values() if d <= dist[dst] - 1)
    assert sum(1 for d in dist.values() if d <= dist[dst]) > cap
    tiny = dataclasses.replace(DEFAULT_CONFIG, khop_broadcast_max=cap)
    capped = path_between(built, src, dst, max_depth=8, cfg=tiny)
    assert capped and len(capped) == dist[dst]
    assert capped[0]["src_id"] == src and capped[-1]["dst_id"] == dst
