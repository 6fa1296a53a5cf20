"""Snapshot diff + HLL sketch + boilerplate NER guard."""

import shutil

import pyarrow as pa
import pytest
import ray.data as rd

from blarify_ray.corpus import entity_universe
from blarify_ray.ops.sketches import HLL, approx_distinct
from blarify_ray.pipelines.graph_diff import entity_diff
from blarify_ray.pipelines.incremental import incremental_update
from blarify_ray.pipelines.kg_build import build_kg
from blarify_ray.rules import Gazetteer

N = 60


def test_entity_diff_added_deleted_modified():
    a, b = "/tmp/blarify_diff_a", "/tmp/blarify_diff_b"
    shutil.rmtree(a, ignore_errors=True)
    shutil.rmtree(b, ignore_errors=True)
    pa_ = build_kg(a, N)
    pb = build_kg(b, N)
    # identical snapshots → empty diff
    assert entity_diff(pa_, pb).count() == 0
    # change content of two pages in snapshot b → non-empty diff
    pb = incremental_update(b, N, [6, 20], content_seed=99)
    rows = entity_diff(pa_, pb).take_all()
    assert rows
    changes = {r["change"] for r in rows}
    assert "MODIFIED" in changes
    for r in rows:
        if r["change"] == "ADDED":
            assert r["n_mentions_old"] is None and r["n_mentions_new"] is not None
        elif r["change"] == "DELETED":
            assert r["n_mentions_new"] is None


def test_entity_diff_relative_across_environments():
    """Two snapshots of the SAME content built under DIFFERENT
    GraphEnvironments: the env-prefixed diff sees disjoint id universes
    (everything ADDED+DELETED), the relative diff (md5(type/name), env
    prefix stripped — relative_id_calculator analog) sees no change; a
    content change shows up as MODIFIED under its relative id."""
    import dataclasses

    from blarify_ray.config import DEFAULT_CONFIG, GraphEnvironment

    a, b = "/tmp/blarify_diff_env_a", "/tmp/blarify_diff_env_b"
    shutil.rmtree(a, ignore_errors=True)
    shutil.rmtree(b, ignore_errors=True)
    pa_ = build_kg(a, N)
    cfg2 = dataclasses.replace(
        DEFAULT_CONFIG, env=GraphEnvironment(environment="staging")
    )
    pb = build_kg(b, N, cfg=cfg2)
    # env-prefixed ids are disjoint → the plain diff is all ADDED/DELETED
    plain = entity_diff(pa_, pb).take_all()
    assert plain and {r["change"] for r in plain} == {"ADDED", "DELETED"}
    # relative ids strip the env prefix → identical content, empty diff
    assert entity_diff(pa_, pb, relative=True).count() == 0
    # a content change in the staging snapshot surfaces as MODIFIED
    pb = incremental_update(b, N, [6, 20], content_seed=99, cfg=cfg2)
    rel = entity_diff(pa_, pb, relative=True).take_all()
    assert rel and "MODIFIED" in {r["change"] for r in rel}


def test_hll_accuracy_and_merge():
    n = 20_000
    ds = rd.from_arrow(pa.table({"v": [f"user-{i % 5000}" for i in range(n)]}))
    est = approx_distinct(ds, "v")
    assert abs(est - 5000) / 5000 < 0.05
    # mergeability: two half-sketches equal the whole
    import numpy as np

    from blarify_ray.ops.sketches import _hash64

    h1, h2, hb = HLL(), HLL(), HLL()
    vals = [f"x{i}" for i in range(1000)]
    h1.add_hashes(_hash64(vals[:500]))
    h2.add_hashes(_hash64(vals[500:]))
    hb.add_hashes(_hash64(vals))
    assert np.array_equal(h1.merge(h2).reg, hb.reg)


def test_boilerplate_sentences_produce_no_unk_mentions():
    gaz = Gazetteer(entity_universe(100))
    ms = gaz.find_mentions("© 2025 Example Media — all rights reserved")
    assert all(m.ner_type != "UNK" for m in ms)
    # normal sentences still produce UNK candidates
    ms2 = gaz.find_mentions("Zorbex Flimworth announced a new product.")
    assert any(m.ner_type == "UNK" for m in ms2)
