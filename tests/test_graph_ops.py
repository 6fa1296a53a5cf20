"""Triangle census + k-core (`ops/graph.py`): exactness against
independent in-test implementations on planted and random graphs,
forced-tier parity (driver pandas vs distributed exchanges), string and
int node ids, and the KG-facing wrappers."""

import dataclasses
import shutil
from collections import defaultdict

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from blarify_ray.config import DEFAULT_CONFIG
from blarify_ray.ops.graph import k_core, triangle_stats

FORCED = dataclasses.replace(DEFAULT_CONFIG, graph_driver_max_edges=0)


def _ref_stats(edge_list):
    """Independent reference: adjacency-set triangle count (each triangle
    seen once per edge, /3) + wedge sum."""
    adj = defaultdict(set)
    es = set()
    for u, v in edge_list:
        if u == v:
            continue
        a, b = (u, v) if u < v else (v, u)
        if (a, b) in es:
            continue
        es.add((a, b))
        adj[a].add(b)
        adj[b].add(a)
    tri3 = sum(len(adj[a] & adj[b]) for a, b in es)
    assert tri3 % 3 == 0
    wedges = sum(d * (d - 1) // 2 for d in (len(s) for s in adj.values()))
    return {"n_edges": len(es), "n_wedges": wedges, "n_triangles": tri3 // 3}


def _ref_kcore(edge_list, k):
    adj = defaultdict(set)
    for u, v in edge_list:
        if u != v:
            adj[u].add(v)
            adj[v].add(u)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for m in adj.pop(n):
                    adj[m].discard(n)
                changed = True
    return sorted(adj)


def _pairs_ds(edge_list):
    return rd.from_pandas(
        pd.DataFrame({"x": [e[0] for e in edge_list], "y": [e[1] for e in edge_list]})
    )


def _rand_graph(rng, n, m, str_ids=False):
    edges = [tuple(rng.randint(0, n, 2)) for _ in range(m)]
    if str_ids:
        edges = [(f"n{u:03d}", f"n{v:03d}") for u, v in edges]
    else:
        edges = [(int(u), int(v)) for u, v in edges]
    return edges


PLANTED = [
    # triangle + pendant
    [(1, 2), (2, 3), (3, 1), (3, 4)],
    # two triangles sharing an edge (4 wedß-closures, 2 triangles)
    [(1, 2), (2, 3), (3, 1), (1, 4), (4, 2)],
    # K4: 4 triangles
    [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)],
    # square, no triangles
    [(1, 2), (2, 3), (3, 4), (4, 1)],
    # multi-edges + self-loop + reversed duplicates collapse
    [(1, 2), (2, 1), (1, 1), (2, 3), (2, 3), (3, 1)],
]


@pytest.mark.parametrize("edges", PLANTED)
def test_triangles_planted_both_tiers(edges):
    ref = _ref_stats(edges)
    for cfg in (DEFAULT_CONFIG, FORCED):
        st = triangle_stats(_pairs_ds(edges), cfg)
        assert {k: st[k] for k in ref} == ref, (cfg.graph_driver_max_edges, st)
        want_cc = 3.0 * ref["n_triangles"] / ref["n_wedges"] if ref["n_wedges"] else 0.0
        assert st["global_cc"] == pytest.approx(want_cc, abs=1e-12)


@pytest.mark.parametrize("str_ids", [False, True])
def test_triangles_random_forced_tier_parity(str_ids):
    rng = np.random.RandomState(11)
    edges = _rand_graph(rng, 40, 300, str_ids=str_ids)
    ref = _ref_stats(edges)
    a = triangle_stats(_pairs_ds(edges), DEFAULT_CONFIG)
    b = triangle_stats(_pairs_ds(edges), FORCED)
    assert a == b
    assert {k: a[k] for k in ref} == ref


def test_triangles_empty():
    st = triangle_stats(_pairs_ds([]), DEFAULT_CONFIG)
    assert st == {"n_edges": 0, "n_wedges": 0, "n_triangles": 0, "global_cc": 0.0}
    # self-loops only → empty after canonicalization
    st = triangle_stats(_pairs_ds([(1, 1), (2, 2)]), DEFAULT_CONFIG)
    assert st["n_edges"] == 0 and st["n_triangles"] == 0


@pytest.mark.parametrize("k", [1, 2, 3])
def test_kcore_planted_both_tiers(k):
    # K4 core plus a tail: tail peels at k=2, K4 survives through k=3
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (5, 6)]
    ref = _ref_kcore(edges, k)
    for cfg in (DEFAULT_CONFIG, FORCED):
        got = sorted(r["node"] for r in k_core(_pairs_ds(edges), k, cfg).take_all())
        assert got == ref, (k, cfg.graph_driver_max_edges, got)


@pytest.mark.parametrize("str_ids", [False, True])
def test_kcore_random_forced_tier_parity(str_ids):
    rng = np.random.RandomState(23)
    edges = _rand_graph(rng, 30, 120, str_ids=str_ids)
    for k in (2, 4):
        ref = _ref_kcore(edges, k)
        a = sorted(r["node"] for r in k_core(_pairs_ds(edges), k, DEFAULT_CONFIG).take_all())
        b = sorted(r["node"] for r in k_core(_pairs_ds(edges), k, FORCED).take_all())
        assert a == ref and b == ref, (k, len(a), len(b), len(ref))


def test_kcore_empty_and_all_peeled():
    assert k_core(_pairs_ds([]), 2, DEFAULT_CONFIG).count() == 0
    # a path graph has no 2-core
    edges = [(1, 2), (2, 3), (3, 4)]
    for cfg in (DEFAULT_CONFIG, FORCED):
        assert k_core(_pairs_ds(edges), 2, cfg).count() == 0


def test_kg_wrappers_run():
    """triangle_census / k_core_entities over a small built KG: census
    matches the reference computed from the KG's own edge table."""
    from blarify_ray.pipelines.graph_analytics import k_core_entities, triangle_census
    from blarify_ray.pipelines.kg_build import build_kg
    from blarify_ray.state.manifest import read_stage

    out = "/tmp/blarify_ray_test_gops"
    shutil.rmtree(out, ignore_errors=True)
    paths = build_kg(out, 60)
    edges = [
        (r["src_id"], r["dst_id"])
        for r in read_stage(paths["edges"], columns=["src_id", "dst_id"]).take_all()
    ]
    ref = _ref_stats(edges)
    df = triangle_census(paths)
    assert df.loc[0, "n_edges"] == ref["n_edges"]
    assert df.loc[0, "n_wedges"] == ref["n_wedges"]
    assert df.loc[0, "n_triangles"] == ref["n_triangles"]
    core = sorted(r["entity_id"] for r in k_core_entities(paths, k=2).take_all())
    assert core == _ref_kcore(edges, 2)
