"""Temporal mention trends (planted-burst ground truth on hand-built
mention/doc tables + KG wrapper smoke) and the deterministic
random-walk corpus (edge validity, walk counts, dead-end termination,
forced-tier bit-parity, determinism across runs)."""

import dataclasses
import shutil

import numpy as np
import pandas as pd
import pytest
import ray.data

from blarify_ray.config import DEFAULT_CONFIG
from blarify_ray.pipelines.graph_analytics import (
    entity_trends,
    mention_trends,
    random_walks,
)
from blarify_ray.pipelines.kg_build import build_kg
from blarify_ray.state.manifest import read_stage

OUT = "/tmp/blarify_ray_test_tw"
WEEK = 7 * 86_400_000_000

FORCED = dataclasses.replace(DEFAULT_CONFIG, workflows_driver_max_edges=0)


@pytest.fixture(scope="module")
def built():
    shutil.rmtree(OUT, ignore_errors=True)
    return build_kg(OUT, 45)


def _mentions(rows):
    return ray.data.from_items(
        [
            {"url": u, "etype": "TOPIC", "key": k, "resolved": r}
            for u, k, r in rows
        ]
    )


def _docs(urls_ts):
    return ray.data.from_items(
        [
            {"url": u, "warc_ts": np.datetime64(t, "us")}
            for u, t in urls_ts
        ]
    )


def test_planted_burst_detected():
    # entity "spark": 1 mention/week for 4 weeks, then 8 in week 5 → burst
    # entity "flat": 2 mentions every week → no burst
    docs, mentions = [], []
    for w in range(5):
        for i in range(10):
            u = f"u{w}_{i}"
            docs.append((u, f"2021-01-{1 + 7*w:02d}T12:00:00"))
        mentions.append((f"u{w}_0", "spark", True))
        mentions.append((f"u{w}_1", "flat", True))
        mentions.append((f"u{w}_2", "flat", True))
    for i in range(7):  # 7 extra spark mentions in week 5 (total 8)
        mentions.append((f"u4_{3+i}", "spark", True))
    mentions.append(("u0_9", "noise", False))  # unresolved: ignored
    out = mention_trends(
        _mentions(mentions), _docs(docs), window_us=WEEK, min_count=3, z=2.0
    ).take_all()
    spark_rows = sorted(
        (r["win_start"], r["n_mentions"], r["is_burst"])
        for r in out
        if r["key"] == "spark"
    )
    assert [n for _, n, _ in spark_rows] == [1, 1, 1, 1, 8]
    assert [b for _, _, b in spark_rows] == [False, False, False, False, True]
    flat_rows = [r for r in out if r["key"] == "flat"]
    assert len(flat_rows) == 5 and not any(r["is_burst"] for r in flat_rows)
    assert not any(r["key"] == "noise" for r in out)


def test_burst_respects_min_count():
    # 0,0,1 pattern scaled tiny: spike of 2 is > mean+2σ? mean=0.67,
    # σ≈0.47 → 2 > 1.6 yes, but min_count=3 suppresses it
    docs = [(f"d{w}_{i}", f"2021-02-{1 + 7*w:02d}T00:00:00") for w in range(3) for i in range(3)]
    mentions = [("d2_0", "tiny", True), ("d2_1", "tiny", True), ("d0_0", "tiny", True)]
    out = mention_trends(
        _mentions(mentions), _docs(docs), window_us=WEEK, min_count=3, z=2.0
    ).take_all()
    assert not any(r["is_burst"] for r in out)


def test_kg_entity_trends_smoke(built):
    rows = entity_trends(built).take_all()
    assert len(rows) > 0
    r = rows[0]
    assert set(r) == {"etype", "key", "win_start", "n_mentions", "is_burst", "entity_id"}
    # entity_id matches the KG's id scheme → every id exists in entities
    ents = {
        e["entity_id"]
        for e in read_stage(built["entities"], columns=["entity_id"]).take_all()
    }
    assert {r["entity_id"] for r in rows} <= ents


def _walk_index(rows):
    walks = {}
    for r in rows:
        walks.setdefault((r["start_id"], r["walk_no"]), {})[r["step"]] = r["node_id"]
    return walks


def test_random_walks_valid_and_deterministic(built):
    edges = {
        (r["src_id"], r["dst_id"])
        for r in read_stage(built["edges"], columns=["src_id", "dst_id"]).take_all()
    }
    ents = {
        r["entity_id"]
        for r in read_stage(built["entities"], columns=["entity_id"]).take_all()
    }
    out1 = random_walks(built, walk_len=5, walks_per_node=2).take_all()
    walks = _walk_index(out1)
    # every entity starts exactly walks_per_node walks
    assert {s for s, _ in walks} == ents
    assert all((e, 0) in walks and (e, 1) in walks for e in ents)
    for (start, _), steps in walks.items():
        ks = sorted(steps)
        assert ks == list(range(len(ks)))  # contiguous steps from 0
        assert steps[0] == start
        for a, b in zip(ks, ks[1:]):
            assert (steps[a], steps[b]) in edges  # every hop is a real edge
        # a walk shorter than walk_len must have ended at a dead end
        if len(ks) - 1 < 5:
            last = steps[ks[-1]]
            assert not any(s == last for s, _ in edges)
    out2 = random_walks(built, walk_len=5, walks_per_node=2).take_all()
    assert sorted(map(tuple, (r.values() for r in out1))) == sorted(
        map(tuple, (r.values() for r in out2))
    )


def test_random_walks_forced_tier_bit_parity(built):
    a = random_walks(built, walk_len=4, walks_per_node=2).take_all()
    b = random_walks(built, walk_len=4, walks_per_node=2, cfg=FORCED).take_all()
    key = lambda r: (r["start_id"], r["walk_no"], r["step"], r["node_id"])
    assert sorted(map(key, a)) == sorted(map(key, b))


def _fake_graph_paths(tmpdir, edges, nodes):
    import os

    import pyarrow.parquet as pq

    ed = os.path.join(tmpdir, "edges")
    en = os.path.join(tmpdir, "entities")
    os.makedirs(ed, exist_ok=True)
    os.makedirs(en, exist_ok=True)
    pq.write_table(
        pa.table(
            {
                "src_id": [a for a, _, _ in edges],
                "dst_id": [b for _, b, _ in edges],
                "weight": pa.array([w for _, _, w in edges], pa.int64()),
            }
        ),
        os.path.join(ed, "part0.parquet"),
    )
    pq.write_table(
        pa.table({"entity_id": nodes}), os.path.join(en, "part0.parquet")
    )
    return {"edges": ed, "entities": en}


import pyarrow as pa  # noqa: E402


def test_weighted_walks_follow_weights(tmp_path):
    # hub → heavy (weight 99) / light (weight 1): weighted walks should
    # overwhelmingly pick heavy; unweighted picks ~50/50. Many starts at
    # the hub via walks_per_node.
    paths = _fake_graph_paths(
        str(tmp_path),
        [("hub", "heavy", 99), ("hub", "light", 1)],
        ["hub", "heavy", "light"],
    )
    out = random_walks(paths, walk_len=1, walks_per_node=200, weighted=True).take_all()
    step1 = [r["node_id"] for r in out if r["step"] == 1 and r["start_id"] == "hub"]
    assert len(step1) == 200
    frac_heavy = sum(1 for n in step1 if n == "heavy") / len(step1)
    assert frac_heavy >= 0.95
    un = random_walks(paths, walk_len=1, walks_per_node=200, weighted=False).take_all()
    u1 = [r["node_id"] for r in un if r["step"] == 1 and r["start_id"] == "hub"]
    fu = sum(1 for n in u1 if n == "heavy") / len(u1)
    assert 0.35 <= fu <= 0.65


def test_weighted_walks_forced_tier_parity(tmp_path):
    paths = _fake_graph_paths(
        str(tmp_path),
        [("a", "b", 5), ("a", "c", 3), ("b", "c", 2), ("c", "a", 7), ("b", "a", 1)],
        ["a", "b", "c"],
    )
    x = random_walks(paths, walk_len=6, walks_per_node=3, weighted=True).take_all()
    y = random_walks(
        paths, walk_len=6, walks_per_node=3, weighted=True, cfg=FORCED
    ).take_all()
    key = lambda r: (r["start_id"], r["walk_no"], r["step"], r["node_id"])
    assert sorted(map(key, x)) == sorted(map(key, y))
    assert len(x) == 3 * 3 * 7  # no dead ends: every walk runs full length


def test_strongest_path_semantics(tmp_path):
    from blarify_ray.pipelines.graph_analytics import strongest_path

    # direct a→c is weak (w=1); the detour a→b→c is strong (min 10):
    # bottleneck semantics must take the detour BFS would skip
    paths = _fake_graph_paths(
        str(tmp_path),
        [("a", "c", 1), ("a", "b", 10), ("b", "c", 10),
         ("c", "d", 4), ("x", "y", 9)],
        ["a", "b", "c", "d", "x", "y"],
    )
    r = strongest_path(paths, "a", "c")
    assert r["bottleneck"] == 10 and r["hops"] == 2
    assert [(s["src_id"], s["dst_id"], s["weight"]) for s in r["steps"]] == [
        ("a", "b", 10), ("b", "c", 10)
    ]
    # equal bottleneck → fewer hops: a→d best is via the strong chain
    r2 = strongest_path(paths, "a", "d")
    assert r2["bottleneck"] == 4 and r2["steps"][-1] == {
        "src_id": "c", "dst_id": "d", "weight": 4
    }
    assert strongest_path(paths, "a", "y") == {
        "bottleneck": 0, "hops": 0, "steps": []
    }


def test_strongest_path_forced_tier_parity(tmp_path):
    import numpy as _np

    from blarify_ray.pipelines.graph_analytics import strongest_path

    rng = _np.random.default_rng(21)
    nodes = [f"v{i:02d}" for i in range(18)]
    edges = sorted(
        {
            (nodes[a], nodes[b], int(w))
            for a, b, w in zip(
                rng.integers(0, 18, 60), rng.integers(0, 18, 60),
                rng.integers(1, 9, 60),
            )
            if a != b
        }
    )
    paths = _fake_graph_paths(str(tmp_path), edges, nodes)
    for dst in ("v05", "v11", "v17"):
        a = strongest_path(paths, "v00", dst, max_rounds=8)
        b = strongest_path(paths, "v00", dst, max_rounds=8, cfg=FORCED)
        assert a == b
