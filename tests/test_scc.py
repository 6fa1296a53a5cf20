"""Strongly connected components: driver Tarjan vs an independent
brute-force reachability reference, forced-tier equality (distributed
forward-backward pivot refinement must match Tarjan exactly), planted
cycle structures, the pathological chain-of-SCCs shape (exercises the
driver-residue finish), and the KG wrapper."""

import dataclasses

import numpy as np
import pytest
import ray.data

from blarify_ray.config import DEFAULT_CONFIG
from blarify_ray.ops.graph import scc

FORCED = dataclasses.replace(DEFAULT_CONFIG, graph_driver_max_edges=0)


def _ds(edges, nodes):
    import pyarrow as pa

    if edges:
        pairs = ray.data.from_items([{"x": a, "y": b} for a, b in edges])
    else:
        pairs = ray.data.from_arrow(
            pa.Table.from_pydict(
                {"x": pa.array([], pa.string()), "y": pa.array([], pa.string())}
            )
        )
    return pairs, ray.data.from_items([{"node": n} for n in nodes])


def _brute(edges, nodes):
    """Independent reference: SCC via pairwise reachability closure."""
    reach = {n: {n} for n in nodes}
    changed = True
    while changed:
        changed = False
        for a, b in edges:
            new = reach[b] - reach[a]
            if new:
                reach[a] |= new
                changed = True
    comp = {}
    for v in nodes:
        members = [u for u in nodes if u in reach[v] and v in reach[u]]
        comp[v] = min(members)
    return comp


def _got(pairs, nodes_ds, cfg=DEFAULT_CONFIG):
    return {
        r["node"]: r["scc"] for r in scc(pairs, nodes_ds, cfg=cfg).take_all()
    }


def _rand_digraph(n=40, m=120, seed=3):
    rng = np.random.default_rng(seed)
    nodes = [f"n{i:02d}" for i in range(n)]
    edges = sorted(
        {(nodes[a], nodes[b]) for a, b in rng.integers(0, n, (m, 2)) if a != b}
    )
    return edges, nodes


def test_driver_matches_bruteforce():
    edges, nodes = _rand_digraph()
    pairs, nds = _ds(edges, nodes)
    assert _got(pairs, nds) == _brute(edges, nodes)


def test_forced_tier_matches_tarjan():
    edges, nodes = _rand_digraph(n=30, m=90, seed=9)
    pairs, nds = _ds(edges, nodes)
    want = _got(pairs, nds)
    pairs2, nds2 = _ds(edges, nodes)
    got = _got(pairs2, nds2, cfg=FORCED)
    assert got == want
    assert any(v != k for k, v in want.items())  # some nontrivial SCC exists


def test_planted_structures():
    # two disjoint 3-cycles + a DAG tail + a self-loop + an isolated node
    edges = [
        ("a1", "a2"), ("a2", "a3"), ("a3", "a1"),
        ("b1", "b2"), ("b2", "b3"), ("b3", "b1"),
        ("a1", "b1"),                      # bridge: still two SCCs
        ("b3", "t1"), ("t1", "t2"),        # DAG tail: singletons
        ("s", "s"),                        # self-loop: singleton SCC of itself
    ]
    nodes = ["a1", "a2", "a3", "b1", "b2", "b3", "t1", "t2", "s", "iso"]
    pairs, nds = _ds(edges, nodes)
    got = _got(pairs, nds)
    assert got["a1"] == got["a2"] == got["a3"] == "a1"
    assert got["b1"] == got["b2"] == got["b3"] == "b1"
    assert got["t1"] == "t1" and got["t2"] == "t2"
    assert got["s"] == "s" and got["iso"] == "iso"
    pairs2, nds2 = _ds(edges, nodes)
    assert _got(pairs2, nds2, cfg=FORCED) == got


def test_chain_of_sccs_residue_fallback():
    # chain of 6 two-cycles c0 <-> c0', c0 -> c1 ... worst case for the
    # peel; with max_rounds=2 the residue finishes on the driver and the
    # labels must still be exact
    edges, nodes = [], []
    for i in range(6):
        a, b = f"c{i}a", f"c{i}b"
        nodes += [a, b]
        edges += [(a, b), (b, a)]
        if i:
            edges.append((f"c{i-1}a", a))
    pairs, nds = _ds(edges, nodes)
    want = _brute(edges, nodes)
    got = {
        r["node"]: r["scc"]
        for r in scc(pairs, nds, cfg=FORCED, max_rounds=2).take_all()
    }
    assert got == want
    assert len(set(want.values())) == 6


def test_kg_scc_wrapper():
    import shutil

    from blarify_ray.pipelines.graph_analytics import scc_sizes
    from blarify_ray.pipelines.kg_build import build_kg

    out = "/tmp/blarify_ray_test_scc_kg"
    shutil.rmtree(out, ignore_errors=True)
    paths = build_kg(out, 40)
    rows = scc_sizes(paths, k=10).take_all()
    assert rows and all(r["n_members"] >= 1 for r in rows)
    ns = [r["n_members"] for r in rows]
    assert ns == sorted(ns, reverse=True)


def test_induced_subgraph_closed_and_tiered():
    """Induced subgraph: edges are exactly those with BOTH endpoints in
    the k-hop node set; forced distributed semi-join tier matches the
    broadcast tier; parquet export round-trips via the tool."""
    import shutil

    from blarify_ray.pipelines.graph_queries import induced_subgraph, k_hop, top_entities
    from blarify_ray.pipelines.kg_build import build_kg
    from blarify_ray.state.manifest import read_stage
    from blarify_ray.tools import call_tool

    out = "/tmp/blarify_ray_test_scc_kg"  # reuse module fixture dir if built
    import os

    if not os.path.isdir(out):
        shutil.rmtree(out, ignore_errors=True)
        build_kg(out, 40)
    paths = {
        "edges": os.path.join(out, "edges"),
        "entities": os.path.join(out, "entities"),
        "docs": os.path.join(out, "docs"),
        "mentions": os.path.join(out, "mentions"),
    }
    seed = top_entities(paths, k=1).take_all()[0]["entity_id"]
    sub = induced_subgraph(paths, [seed], radius=2)
    node_set = {r["entity_id"] for r in sub["entities"].take_all()}
    khop_set = {r["entity_id"] for r in k_hop(paths, [seed], max_depth=2).take_all()}
    assert node_set == khop_set and seed in node_set
    erows = sub["edges"].take_all()
    assert sub["n_edges"] == len(erows) > 0
    assert all(r["src_id"] in node_set and r["dst_id"] in node_set for r in erows)
    # closure: every all-edges row with both endpoints inside is included
    all_edges = read_stage(paths["edges"]).take_all()
    want = [
        (r["src_id"], r["dst_id"], r["pred"], r["url"], r["sent_id"])
        for r in all_edges
        if r["src_id"] in node_set and r["dst_id"] in node_set
    ]
    got = [(r["src_id"], r["dst_id"], r["pred"], r["url"], r["sent_id"]) for r in erows]
    assert sorted(got) == sorted(want)
    # forced distributed tier (broadcast cap 0) produces identical sets
    forced = dataclasses.replace(DEFAULT_CONFIG, khop_broadcast_max=0)
    sub2 = induced_subgraph(paths, [seed], radius=2, cfg=forced)
    got2 = [
        (r["src_id"], r["dst_id"], r["pred"], r["url"], r["sent_id"])
        for r in sub2["edges"].take_all()
    ]
    assert sorted(got2) == sorted(got)
    assert {r["entity_id"] for r in sub2["entities"].take_all()} == node_set
    # tool export writes parquet
    exp = call_tool(
        paths, "export_subgraph",
        {"seed_ids": [seed], "radius": 1, "out_dir": "/tmp/blarify_ray_test_subg"},
    )
    assert exp["n_entities"] > 0 and os.path.isdir(exp["out_dir"] + "/entities")


def test_directed_ring_single_scc_distributed():
    # a directed ring is ONE SCC whose in-block pivot distance equals
    # n-1 — the frontier fixpoint must run to completion (a truncated
    # reach would split the ring into several components); the fixpoint
    # has no round cap by construction, so ring size only affects test
    # wall time
    nodes = [f"r{i:02d}" for i in range(12)]
    edges = [(nodes[i], nodes[(i + 1) % 12]) for i in range(12)]
    pairs, nds = _ds(edges, nodes)
    got = _got(pairs, nds, cfg=FORCED)
    assert set(got.values()) == {"r00"}
    assert len(got) == 12
