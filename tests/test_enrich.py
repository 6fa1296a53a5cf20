"""External-enrichment connector (GitHub-integration analog): planted
targets attach to the right KG entity ids, unknown surfaces drop, rerun
is an idempotent checkpoint skip."""

import os
import shutil

from blarify_ray.config import DEFAULT_CONFIG
from blarify_ray.corpus import entity_universe
from blarify_ray.ids import entity_id
from blarify_ray.linking import known_alias_norms
from blarify_ray.pipelines.enrich import (
    attach_external,
    external_edges_view,
    synth_external_records,
)
from blarify_ray.rules import Gazetteer
from blarify_ray.state.manifest import read_stage
from blarify_ray.text import normalize_surface

OUT = "/tmp/blarify_ray_test_enrich"
N_PAGES = 200


def test_external_attachment_unmatched_drop_idempotence():
    ents = entity_universe(N_PAGES)
    known = known_alias_norms(Gazetteer(ents))
    recs = synth_external_records(100, N_PAGES)
    shutil.rmtree(OUT, ignore_errors=True)
    os.makedirs(OUT, exist_ok=True)
    path = attach_external(OUT, recs, known, source_fingerprint="t1")
    rows = external_edges_view(path).take_all()
    by_ext = {r["ext_id"]: r for r in rows}

    # planted ground truth: replicate the fixture's targeting rule
    n_checked = 0
    for i in range(100):
        if i % 7 == 3:
            assert f"ext-{i:06d}" not in by_ext  # unknown surface → dropped
            continue
        e = ents[(i * 13) % len(ents)]
        surf = e.aliases[i % len(e.aliases)]
        hit = known.get(normalize_surface(surf))
        if hit is None:  # ambiguous alias → dropped like unmatched blame
            assert f"ext-{i:06d}" not in by_ext
            continue
        name, etype = hit
        r = by_ext[f"ext-{i:06d}"]
        assert r["src_id"] == entity_id(DEFAULT_CONFIG.env, etype, name)
        assert r["pred"] == "MODIFIED_BY"
        n_checked += 1
    assert n_checked >= 50  # most records must attach

    # node projection: one node per edge, ids align
    nodes = read_stage(os.path.join(path, "nodes")).take_all()
    assert {n["entity_id"] for n in nodes} == {r["dst_id"] for r in rows}
    assert all(n["type"] in ("CHANGE", "REVIEW") for n in nodes)

    # idempotent rerun: checkpoint skip, identical rows
    mtime = os.path.getmtime(os.path.join(path, "_MANIFEST.json"))
    path2 = attach_external(OUT, recs, known, source_fingerprint="t1")
    assert os.path.getmtime(os.path.join(path2, "_MANIFEST.json")) == mtime
    rows2 = external_edges_view(path2).take_all()
    assert sorted(map(str, rows)) == sorted(map(str, rows2))


def test_mentions_by_entity_index_parity_and_reuse():
    """The lazily built mentions_by_entity hive index must hold exactly
    the resolved mention rows, bucketed by the canonical entity id, and
    a second ensure call must reuse the checkpoint (no rebuild)."""
    from blarify_ray.ids import id_bucket
    from blarify_ray.pipelines.graph_queries import ensure_mentions_by_entity
    from blarify_ray.pipelines.kg_build import build_kg

    out = "/tmp/blarify_ray_test_mbe"
    n = 60
    shutil.rmtree(out, ignore_errors=True)
    paths = build_kg(out, n)
    idx = ensure_mentions_by_entity(paths)
    got = {
        (r["url"], r["sent_id"], r["key"], r["etype"])
        for r in read_stage(idx, columns=["url", "sent_id", "key", "etype"]).take_all()
    }
    mentions = read_stage(
        paths["mentions"],
        columns=["url", "sent_id", "surface", "key", "etype", "resolved"],
    ).take_all()
    want = {
        (m["url"], m["sent_id"], m["key"], m["etype"])
        for m in mentions
        if m["resolved"]
    }
    assert got == want and got
    # bucket dirs match the ENV-INDEPENDENT relative id's bucket (the
    # index must not couple to cfg.env — mention rows carry no env)
    from blarify_ray.pipelines.graph_diff import relative_entity_id

    sample = next(m for m in mentions if m["resolved"])
    b = id_bucket(relative_entity_id(sample["etype"], sample["key"]),
                  DEFAULT_CONFIG.num_buckets)
    rows = read_stage(os.path.join(idx, f"bucket={b}"),
                      columns=["key", "etype"]).take_all()
    assert any(r["key"] == sample["key"] and r["etype"] == sample["etype"] for r in rows)
    # idempotent reuse
    mtime = os.path.getmtime(os.path.join(idx, "_MANIFEST.json"))
    assert ensure_mentions_by_entity(paths) == idx
    assert os.path.getmtime(os.path.join(idx, "_MANIFEST.json")) == mtime

    # usage-sites tool (19th): index lookup == full-scan golden
    from blarify_ray.tools import call_tool, list_tools

    ents = read_stage(paths["entities"], columns=["entity_id", "name", "type"]).take_all()
    target = max(
        ents,
        key=lambda e: sum(
            1 for m in mentions
            if m["resolved"] and m["key"] == e["name"] and m["etype"] == e["type"]
        ),
    )
    assert any(t["name"] == "get_entity_mentions" for t in list_tools())
    got_sites = call_tool(paths, "get_entity_mentions", {"entity_id": target["entity_id"]})
    want_sites = sorted(
        (m["url"], m["sent_id"], m["surface"])
        for m in mentions
        if m["resolved"] and m["key"] == target["name"] and m["etype"] == target["type"]
    )[:100]
    assert [(r["url"], r["sent_id"], r["surface"]) for r in got_sites] == want_sites
    assert got_sites


def test_blame_info_tool_golden():
    """get_blame_info (18th tool, tools/get_blame_info.py analog): history
    ordered newest-first with narrowest-span tiebreak, and each mention
    position attributed to the MOST SPECIFIC covering record — verified
    against a hand-computed reference from the raw tables."""
    from blarify_ray.pipelines.enrich import blame_info
    from blarify_ray.pipelines.kg_build import build_kg
    from blarify_ray.tools import call_tool, list_tools

    out = "/tmp/blarify_ray_test_blame"
    n = 60
    shutil.rmtree(out, ignore_errors=True)
    paths = build_kg(out, n)
    ents_u = entity_universe(n)
    known = known_alias_norms(Gazetteer(ents_u))
    recs = synth_external_records(200, n)
    ext = attach_external(out, recs, known, source_fingerprint="blame-t")
    edges = external_edges_view(ext).take_all()

    # pick the entity with the most records that also exists in the KG
    from collections import Counter

    kg_ids = {
        r["entity_id"]
        for r in read_stage(paths["entities"], columns=["entity_id"]).take_all()
    }
    counts = Counter(r["src_id"] for r in edges if r["src_id"] in kg_ids)
    assert counts, "no external record attached to a built entity"
    eid = counts.most_common(1)[0][0]

    assert any(t["name"] == "get_blame_info" for t in list_tools())
    got = call_tool(paths, "get_blame_info", {"entity_id": eid})
    assert got["entity"]["entity_id"] == eid

    # history: exactly this entity's records, ordered (ts desc, width, ext_id)
    want_hist = sorted(
        (r for r in edges if r["src_id"] == eid),
        key=lambda r: (-r["ts"], r["span_end"] - r["span_start"], r["ext_id"]),
    )
    assert [h["ext_id"] for h in got["history"]] == [h["ext_id"] for h in want_hist]

    # attribution: hand-computed most-specific covering record per mention
    ent = got["entity"]
    mentions = read_stage(
        paths["mentions"], columns=["url", "sent_id", "key", "etype", "resolved"]
    ).take_all()
    pts = [
        (m["url"], m["sent_id"])
        for m in mentions
        if m["resolved"] and m["key"] == ent["name"] and m["etype"] == ent["type"]
    ]
    want = {}
    for url, sid in pts:
        cover = [
            h for h in want_hist if h["span_start"] <= sid < h["span_end"]
        ]
        if cover:
            best = min(
                cover,
                key=lambda h: (h["span_end"] - h["span_start"], h["span_start"], h["ext_id"]),
            )
            want[(url, sid)] = best["ext_id"]
    got_attr = {(r["url"], r["sent_id"]): r["ext_id"] for r in got["attribution"]}
    assert got_attr == want and want  # nonempty, exact


def test_entity_mentions_cross_environment_build():
    """Regression: the mentions index must bucket by the ENV-INDEPENDENT
    relative id. A KG built under a non-default GraphEnvironment, queried
    through the tool surface (which never passes cfg), must still return
    the usage sites — the env-coupled bucketing silently returned []."""
    import dataclasses

    from blarify_ray.config import GraphEnvironment
    from blarify_ray.pipelines.kg_build import build_kg
    from blarify_ray.tools import call_tool

    out = "/tmp/blarify_ray_test_mbe_env"
    n = 60
    shutil.rmtree(out, ignore_errors=True)
    cfg = dataclasses.replace(
        DEFAULT_CONFIG, env=GraphEnvironment(environment="staging")
    )
    paths = build_kg(out, n, cfg=cfg)
    mentions = read_stage(
        paths["mentions"],
        columns=["url", "sent_id", "surface", "key", "etype", "resolved"],
    ).take_all()
    ents = read_stage(
        paths["entities"], columns=["entity_id", "name", "type"]
    ).take_all()
    target = max(
        ents,
        key=lambda e: sum(
            1 for m in mentions
            if m["resolved"] and m["key"] == e["name"] and m["etype"] == e["type"]
        ),
    )
    got = call_tool(paths, "get_entity_mentions", {"entity_id": target["entity_id"]})
    want = sorted(
        (m["url"], m["sent_id"], m["surface"])
        for m in mentions
        if m["resolved"] and m["key"] == target["name"] and m["etype"] == target["type"]
    )[:100]
    assert [(r["url"], r["sent_id"], r["surface"]) for r in got] == want
    assert got
