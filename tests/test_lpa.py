"""Label-propagation communities: spec check against an independent
in-test implementation (plain dicts, no shared code), EXACT forced-tier
parity (int64 weights + pinned tie-break → the tiers must be
bit-identical, unlike PageRank's float tolerance), and a planted
two-clique graph where the communities are known by construction."""

import dataclasses
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from blarify_ray.config import DEFAULT_CONFIG
from blarify_ray.pipelines.graph_analytics import label_propagation, top_communities
from blarify_ray.pipelines.kg_build import build_kg
from blarify_ray.state.manifest import read_stage

N = 60
OUT = "/tmp/blarify_ray_test_lpa"
ITERS = 5

FORCED = dataclasses.replace(DEFAULT_CONFIG, lpa_driver_max_edges=0)


@pytest.fixture(scope="module")
def built():
    shutil.rmtree(OUT, ignore_errors=True)
    return build_kg(OUT, N)


def _reference_lpa(ents, edges, iters=ITERS):
    """Independent synchronous-LPA spec: adopt the neighbor label with
    max total incident weight, ties → lexicographically smallest."""
    lab = {e: e for e in ents}
    inc = {e: [] for e in ents}
    for r in edges:
        inc[r["src_id"]].append((r["dst_id"], r["weight"]))
        inc[r["dst_id"]].append((r["src_id"], r["weight"]))
    for _ in range(iters):
        votes = {}
        for v, nbrs in inc.items():
            if not nbrs:
                continue
            score = {}
            for u, w in nbrs:
                score[lab[u]] = score.get(lab[u], 0) + w
            votes[v] = min(score, key=lambda L: (-score[L], L))
        new = {v: votes.get(v, lab[v]) for v in ents}
        if new == lab:
            break
        lab = new
    return lab


def test_lpa_matches_reference(built):
    ents = sorted(
        r["entity_id"]
        for r in read_stage(built["entities"], columns=["entity_id"]).take_all()
    )
    edges = read_stage(
        built["edges"], columns=["src_id", "dst_id", "weight"]
    ).take_all()
    want = _reference_lpa(ents, edges)
    got = {
        r["entity_id"]: r["community"]
        for r in label_propagation(built, iters=ITERS).take_all()
    }
    assert got == want


def test_lpa_forced_tier_bit_identical(built):
    driver = {
        r["entity_id"]: r["community"]
        for r in label_propagation(built, iters=ITERS).take_all()
    }
    dist = {
        r["entity_id"]: r["community"]
        for r in label_propagation(built, iters=ITERS, cfg=FORCED).take_all()
    }
    assert dist == driver


def _write_stage(dirpath, table):
    os.makedirs(dirpath, exist_ok=True)
    pq.write_table(table, os.path.join(dirpath, "part-0.parquet"))


@pytest.fixture()
def planted(tmp_path):
    """Two 4-cliques (weight-3 edges) joined by one weight-1 bridge,
    plus an isolated entity. LPA must label each clique with its min
    member id, leave the isolate alone, and not merge across the
    bridge."""
    a = [f"e://a{i}" for i in range(4)]
    b = [f"e://b{i}" for i in range(4)]
    iso = ["e://zz_isolated"]
    src, dst, w = [], [], []
    for grp in (a, b):
        for i in range(len(grp)):
            for j in range(i + 1, len(grp)):
                src.append(grp[i]); dst.append(grp[j]); w.append(3)
    src.append(a[0]); dst.append(b[0]); w.append(1)  # bridge
    ents = pa.Table.from_pydict({"entity_id": pa.array(a + b + iso, pa.string())})
    edges = pa.Table.from_pydict(
        {
            "src_id": pa.array(src, pa.string()),
            "dst_id": pa.array(dst, pa.string()),
            "weight": pa.array(w, pa.int64()),
        }
    )
    paths = {
        "entities": str(tmp_path / "entities"),
        "edges": str(tmp_path / "edges"),
    }
    _write_stage(paths["entities"], ents)
    _write_stage(paths["edges"], edges)
    return paths, a, b, iso


@pytest.mark.parametrize("cfg", [DEFAULT_CONFIG, FORCED], ids=["driver", "dist"])
def test_lpa_planted_cliques(ray_session, planted, cfg):
    paths, a, b, iso = planted
    got = {
        r["entity_id"]: r["community"]
        for r in label_propagation(paths, iters=ITERS, cfg=cfg).take_all()
    }
    assert set(got[v] for v in a) == {min(a)}
    assert set(got[v] for v in b) == {min(b)}
    assert got[iso[0]] == iso[0]


def test_top_communities_counts(ray_session, planted):
    paths, a, b, iso = planted
    rows = top_communities(paths, k=10, iters=ITERS).take_all()
    sizes = {r["community"]: r["n_members"] for r in rows}
    assert sizes == {min(a): 4, min(b): 4, iso[0]: 1}
    assert sum(sizes.values()) == 9
