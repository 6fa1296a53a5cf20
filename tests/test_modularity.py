"""Modularity op: independent-formula parity on random partitions,
known planted value, invariances, degenerate inputs."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from blarify_ray.ops.graph import modularity


def _independent_q(pairs, assign):
    """Textbook Q from the adjacency definition: (1/2m) Σ_ij
    (A_ij − k_i k_j / 2m) δ(c_i, c_j) — not the per-community form the
    engine folds."""
    es = sorted({tuple(sorted(p)) for p in pairs if p[0] != p[1]})
    m = len(es)
    if m == 0:
        return 0.0
    deg: dict = {}
    for x, y in es:
        deg[x] = deg.get(x, 0) + 1
        deg[y] = deg.get(y, 0) + 1
    q = 0.0
    nodes = list(deg)
    a = {tuple(sorted(e)): 1 for e in es}
    for i in nodes:
        for j in nodes:
            if assign.get(i) != assign.get(j):
                continue
            aij = 1 if i != j and tuple(sorted((i, j))) in a else 0
            q += aij - deg[i] * deg[j] / (2.0 * m)
    return q / (2.0 * m)


def _ds(pairs, assign):
    e = rd.from_pandas(
        pd.DataFrame({"x": [p[0] for p in pairs], "y": [p[1] for p in pairs]})
    )
    a = rd.from_pandas(
        pd.DataFrame(
            {"node": list(assign), "community": [assign[n] for n in assign]}
        )
    ).map_batches(lambda df: df, batch_format="pandas")
    return e, a


def test_two_triangles_bridge(ray_session):
    pairs = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    natural = {0: "a", 1: "a", 2: "a", 3: "b", 4: "b", 5: "b"}
    e, a = _ds(pairs, natural)
    q = modularity(e, a)
    # m=7, intra=6, D_a = D_b = 7: Q = 6/7 - 2*(7/14)^2
    assert q == pytest.approx(6 / 7 - 0.5, abs=1e-12)
    assert q == pytest.approx(_independent_q(pairs, natural), abs=1e-12)
    # the trivial all-in-one partition scores exactly 0
    one = {n: "z" for n in range(6)}
    e, a = _ds(pairs, one)
    assert modularity(e, a) == pytest.approx(0.0, abs=1e-12)


def test_random_partition_matches_independent(ray_session):
    rng = np.random.RandomState(19)
    pairs = sorted({tuple(sorted(rng.choice(12, 2, replace=False))) for _ in range(25)})
    assign = {n: f"c{rng.randint(3)}" for n in range(12)}
    e, a = _ds(pairs, assign)
    assert modularity(e, a) == pytest.approx(
        _independent_q(pairs, assign), abs=1e-12
    )


def test_duplicate_and_loop_edges_collapse(ray_session):
    pairs = [(0, 1), (1, 0), (0, 1), (2, 2), (1, 2)]
    assign = {0: "a", 1: "a", 2: "b"}
    e, a = _ds(pairs, assign)
    assert modularity(e, a) == pytest.approx(
        _independent_q(pairs, assign), abs=1e-12
    )


def test_empty(ray_session):
    e, a = _ds([], {})
    assert modularity(e, a) == 0.0


def _independent_stats(pairs, assign):
    es = sorted({tuple(sorted(p)) for p in pairs if p[0] != p[1]})
    m = len(es)
    out = {}
    for c in set(assign.values()):
        members = {n for n, cc in assign.items() if cc == c}
        internal = sum(1 for x, y in es if x in members and y in members)
        cut = sum(1 for x, y in es if (x in members) != (y in members))
        vol = sum(1 for x, y in es for e in (x, y) if e in members)
        den = min(vol, 2 * m - vol)
        out[c] = {
            "n_nodes": len(members), "n_internal": internal, "n_cut": cut,
            "volume": vol, "conductance": cut / den if den > 0 else 0.0,
        }
    return out


def test_community_stats_matches_independent(ray_session):
    from blarify_ray.ops.graph import community_stats

    rng = np.random.RandomState(31)
    pairs = sorted({tuple(sorted(rng.choice(10, 2, replace=False))) for _ in range(22)})
    assign = {n: f"c{n % 3}" for n in range(10)}
    e, a = _ds(pairs, assign)
    got = {r["community"]: r for r in community_stats(e, a).take_all()}
    want = _independent_stats(pairs, assign)
    assert set(got) == set(want)
    for c, w in want.items():
        for k, v in w.items():
            assert got[c][k] == pytest.approx(v, abs=1e-12), (c, k)


def test_community_stats_whole_graph_one_community(ray_session):
    from blarify_ray.ops.graph import community_stats

    pairs = [(0, 1), (1, 2), (2, 0)]
    e, a = _ds(pairs, {0: "z", 1: "z", 2: "z"})
    rows = community_stats(e, a).take_all()
    assert len(rows) == 1
    r = rows[0]
    assert r["n_internal"] == 3 and r["n_cut"] == 0 and r["volume"] == 6
    assert r["conductance"] == 0.0  # denominator min(vol, 2m-vol) = 0
