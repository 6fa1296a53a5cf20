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
