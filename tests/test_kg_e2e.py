"""End-to-end: the Ray pipeline must reproduce the serial golden EXACTLY
(triples, entities, edges), resume from checkpoints, and satisfy the
structural invariants of FIXTURES.md §4."""

import os
import shutil

import pyarrow.parquet as pq
import pytest
import ray.data as rd

from blarify_ray.corpus import gen_page_rows
from blarify_ray.pipelines.kg_build import build_kg, triples_table
from blarify_ray.serial import run_serial
from blarify_ray.state.manifest import read_manifest

N = 80
OUT = "/tmp/blarify_ray_test_e2e"


def _stage_rows(path):
    files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]
    return rd.read_parquet(files).take_all()


@pytest.fixture(scope="module")
def built():
    shutil.rmtree(OUT, ignore_errors=True)
    paths = build_kg(OUT, N)
    rows = []
    for i in range(N):
        rows.extend(gen_page_rows(i, N))
    serial = run_serial(rows, N)
    return paths, serial


def test_text_byte_identical(built):
    paths, serial = built
    ray_sha = {r["url"]: r["text_sha"] for r in _stage_rows(paths["docs"])}
    ser_sha = {d["url"]: d["text_sha"] for d in serial["docs"]}
    assert ray_sha == ser_sha


def test_triples_match_serial(built):
    paths, serial = built
    got = {
        (r["url"], r["sent_id"], r["subj"], r["pred"], r["obj"])
        for r in triples_table(paths).take_all()
    }
    want = {
        (t["url"], t["sent_id"], t["subj"], t["pred"], t["obj"])
        for t in serial["triples"]
    }
    assert got == want


def test_entities_match_serial(built):
    paths, serial = built
    got = {
        (e["entity_id"], e["name"], e["type"], tuple(e["aliases"]), e["n_mentions"])
        for e in _stage_rows(paths["entities"])
    }
    want = {
        (e["entity_id"], e["name"], e["type"], tuple(e["aliases"]), e["n_mentions"])
        for e in serial["entities"]
    }
    assert got == want


def test_edges_match_serial_and_no_dangling(built):
    paths, serial = built
    edges = _stage_rows(paths["edges"])
    got = {
        (e["src_id"], e["dst_id"], e["pred"], e["url"], e["sent_id"], e["weight"], e["scope_text"])
        for e in edges
    }
    want = {
        (e["src_id"], e["dst_id"], e["pred"], e["url"], e["sent_id"], e["weight"], e["scope_text"])
        for e in serial["edges"]
    }
    assert got == want
    # scope_text provenance must actually be populated (evidence snippet)
    assert edges and all(e["scope_text"] for e in edges)
    eids = {e["entity_id"] for e in _stage_rows(paths["entities"])}
    assert all(e["src_id"] in eids and e["dst_id"] in eids for e in edges)


def test_manifests_and_resume(built):
    paths, _ = built
    for stage in ("docs", "mentions", "canonical", "entities", "edges"):
        man = read_manifest(OUT, stage)
        assert man is not None and man["rows"] > 0 and "lineage" in man

    # resume: delete one downstream stage; re-run must rebuild ONLY it
    shutil.rmtree(paths["edges"])
    docs_mtime = os.path.getmtime(os.path.join(paths["docs"], "_MANIFEST.json"))
    paths2 = build_kg(OUT, N)
    assert os.path.getmtime(os.path.join(paths2["docs"], "_MANIFEST.json")) == docs_mtime
    assert read_manifest(OUT, "edges") is not None


def test_oversize_latest_vs_older_crawl_order():
    """Spec-order regression (serial.py:42-46): latest-crawl-wins dedup
    runs BEFORE the oversize drop. Page index 2738 hits both cadences
    (i%37==0 → stale dup crawl exists, i%101==11 → LATEST crawl is
    oversize): the url must vanish entirely — the in-cap older crawl must
    NOT be resurrected by the Ray pipeline."""
    import pyarrow as pa

    from blarify_ray.corpus import page_url
    from blarify_ray.schemas import PAGES

    n = 2750
    idxs = [2738, 0, 1, 2, 11, 37, 74]
    rows = []
    for i in idxs:
        rows.extend(gen_page_rows(i, n))
    serial = run_serial(rows, n)
    assert page_url(2738) not in {d["url"] for d in serial["docs"]}

    out = "/tmp/blarify_ray_test_oversize_dedup"
    shutil.rmtree(out, ignore_errors=True)
    pages = rd.from_arrow(pa.Table.from_pylist(rows, schema=PAGES))
    paths = build_kg(out, n, pages=pages, source_fingerprint="oversize-dedup-test")
    ray_docs = {r["url"]: r["text_sha"] for r in _stage_rows(paths["docs"])}
    assert ray_docs == {d["url"]: d["text_sha"] for d in serial["docs"]}
    got = {
        (r["url"], r["sent_id"], r["subj"], r["pred"], r["obj"])
        for r in triples_table(paths).take_all()
    }
    want = {
        (t["url"], t["sent_id"], t["subj"], t["pred"], t["obj"])
        for t in serial["triples"]
    }
    assert got == want


def test_canonical_map_copartition_path(built):
    """Open-vocabulary tier: with canon_broadcast_max forced to 0 the S6
    resolve uses the hash-co-partitioned lookup join against the sharded
    canonical table instead of a broadcast driver dict — output must be
    EXACTLY the broadcast path's (== serial golden)."""
    import dataclasses

    from blarify_ray.config import DEFAULT_CONFIG

    _, serial = built
    cfg = dataclasses.replace(DEFAULT_CONFIG, canon_broadcast_max=0)
    out2 = "/tmp/blarify_ray_test_e2e_coparT"
    shutil.rmtree(out2, ignore_errors=True)
    paths2 = build_kg(out2, N, cfg)
    got_ents = {
        (e["entity_id"], e["name"], e["type"], tuple(e["aliases"]), e["n_mentions"])
        for e in _stage_rows(paths2["entities"])
    }
    want_ents = {
        (e["entity_id"], e["name"], e["type"], tuple(e["aliases"]), e["n_mentions"])
        for e in serial["entities"]
    }
    assert got_ents == want_ents
    got_edges = {
        (e["src_id"], e["dst_id"], e["pred"], e["url"], e["sent_id"], e["weight"], e["scope_text"])
        for e in _stage_rows(paths2["edges"])
    }
    want_edges = {
        (e["src_id"], e["dst_id"], e["pred"], e["url"], e["sent_id"], e["weight"], e["scope_text"])
        for e in serial["edges"]
    }
    assert got_edges == want_edges


def test_forced_tiers_ner_actor_and_shuffle_dedup(built):
    """Non-default tiers must reproduce the default tiers exactly:
    ner_stateless=False runs S2–S4 as the actor pool instead of
    stateless tasks; dedup_broadcast_max=0 forces the post-extract
    hash-partitioned shuffle dedup instead of the broadcast winner
    filter."""
    import dataclasses

    from blarify_ray.config import DEFAULT_CONFIG

    _, serial = built
    cfg = dataclasses.replace(
        DEFAULT_CONFIG, ner_stateless=False, dedup_broadcast_max=0
    )
    out2 = "/tmp/blarify_ray_test_e2e_forcedtier"
    shutil.rmtree(out2, ignore_errors=True)
    paths2 = build_kg(out2, N, cfg)
    ray_sha = {r["url"]: r["text_sha"] for r in _stage_rows(paths2["docs"])}
    assert ray_sha == {d["url"]: d["text_sha"] for d in serial["docs"]}
    got = {
        (r["url"], r["sent_id"], r["subj"], r["pred"], r["obj"])
        for r in triples_table(paths2, cfg).take_all()
    }
    want = {
        (t["url"], t["sent_id"], t["subj"], t["pred"], t["obj"])
        for t in serial["triples"]
    }
    assert got == want


def test_partitioned_sorted_output(built):
    paths, _ = built
    buckets = [d for d in os.listdir(paths["entities"]) if d.startswith("bucket=")]
    assert len(buckets) > 1
    one = buckets[0]
    files = [
        os.path.join(paths["entities"], one, f)
        for f in os.listdir(os.path.join(paths["entities"], one))
        if f.endswith(".parquet")
    ]
    ids = []
    for f in sorted(files):
        ids.extend(pq.read_table(f, columns=["entity_id"])["entity_id"].to_pylist())
    assert ids == sorted(ids)


def test_tee_batch_retry_overwrites_not_appends(tmp_path):
    """Fused-stage docs tee: a Ray task retry re-executes the same batch;
    the deterministic filename must make that an overwrite, never a
    duplicate part (uuid names silently duplicated doc rows)."""
    import os

    import pyarrow as pa

    from blarify_ray.pipelines.kg_build import tee_batch

    d = str(tmp_path)
    batch = pa.table({"url": ["u1", "u2", "u3"], "text": ["a", "b", "c"]})
    tee_batch(batch, d)
    tee_batch(batch, d)  # simulated retry
    files = [f for f in os.listdir(d) if f.endswith(".parquet")]
    assert len(files) == 1
    other = pa.table({"url": ["u4"], "text": ["d"]})
    tee_batch(other, d)
    assert len([f for f in os.listdir(d) if f.endswith(".parquet")]) == 2
    empty = batch.slice(0, 0)
    assert tee_batch(empty, d).num_rows == 0  # no file for empty batches
    assert len([f for f in os.listdir(d) if f.endswith(".parquet")]) == 2


def test_fully_distributed_canonical_assembly(built, monkeypatch):
    """VERDICT r4 #1: with canon_driver_max_norms=0, cc_driver_max_pairs=0
    AND canon_broadcast_max=0, S5 must run the dataset-native assembly
    end to end — the canonical parquet is written SHARDED by the dataset
    (never a driver-collected table), no norm-scale dict (attachment map
    or CC label map) materializes on the driver, and the final
    entities/edges still equal the serial golden exactly."""
    import dataclasses

    from blarify_ray.config import DEFAULT_CONFIG
    from blarify_ray.pipelines.kg_build import canonical_dir
    from blarify_ray.stages import canonicalize as canon_mod

    # the dict-building code paths must be unreachable in this regime
    def _boom(*a, **k):  # pragma: no cover - failure-mode guard
        raise AssertionError("driver dict assembly ran in forced-distributed tier")

    monkeypatch.setattr(canon_mod, "connected_components", _boom)
    monkeypatch.setattr(canon_mod, "min_label_components", _boom)
    monkeypatch.setattr(canon_mod, "build_canonical_map", _boom)

    _, serial = built
    cfg = dataclasses.replace(
        DEFAULT_CONFIG,
        canon_driver_max_norms=0,
        cc_driver_max_pairs=0,
        canon_broadcast_max=0,
    )
    out2 = "/tmp/blarify_ray_test_e2e_fulldist_canon"
    shutil.rmtree(out2, ignore_errors=True)
    paths2 = build_kg(out2, N, cfg)

    cdir = canonical_dir(paths2["canonical"])
    assert os.path.isdir(cdir)
    # the driver tiers write exactly "canonical-0.parquet"; the dataset
    # write never uses that name — its absence proves the sharded branch
    assert not os.path.exists(os.path.join(cdir, "canonical-0.parquet"))

    got_ents = {
        (e["entity_id"], e["name"], e["type"], tuple(e["aliases"]), e["n_mentions"])
        for e in _stage_rows(paths2["entities"])
    }
    want_ents = {
        (e["entity_id"], e["name"], e["type"], tuple(e["aliases"]), e["n_mentions"])
        for e in serial["entities"]
    }
    assert got_ents == want_ents
    got_edges = {
        (e["src_id"], e["dst_id"], e["pred"], e["url"], e["sent_id"], e["weight"], e["scope_text"])
        for e in _stage_rows(paths2["edges"])
    }
    want_edges = {
        (e["src_id"], e["dst_id"], e["pred"], e["url"], e["sent_id"], e["weight"], e["scope_text"])
        for e in serial["edges"]
    }
    assert got_edges == want_edges


def test_sharded_gazetteer_tier_matches_serial(built):
    """Forced sharded-dictionary tier (gazetteer_broadcast_max=0): S2-S4
    probe the hive-sharded alias table instead of a broadcast Gazetteer
    — triples and entities must equal the serial golden exactly, and the
    shard layout stage must exist."""
    import dataclasses

    from blarify_ray.config import DEFAULT_CONFIG

    _, serial = built
    cfg = dataclasses.replace(
        DEFAULT_CONFIG, gazetteer_broadcast_max=0, gazetteer_shards=8
    )
    out2 = "/tmp/blarify_ray_test_e2e_gazshard"
    shutil.rmtree(out2, ignore_errors=True)
    paths2 = build_kg(out2, N, cfg)
    assert os.path.isdir(os.path.join(out2, "gaz_shards"))
    assert any(
        d.startswith("shard=") for d in os.listdir(os.path.join(out2, "gaz_shards"))
    )
    got = {
        (r["url"], r["sent_id"], r["subj"], r["pred"], r["obj"])
        for r in triples_table(paths2, cfg).take_all()
    }
    want = {
        (t["url"], t["sent_id"], t["subj"], t["pred"], t["obj"])
        for t in serial["triples"]
    }
    assert got == want
    got_ents = {
        (e["entity_id"], e["name"], e["type"], tuple(e["aliases"]), e["n_mentions"])
        for e in _stage_rows(paths2["entities"])
    }
    want_ents = {
        (e["entity_id"], e["name"], e["type"], tuple(e["aliases"]), e["n_mentions"])
        for e in serial["entities"]
    }
    assert got_ents == want_ents
