"""Size-tiered doc-layer vector search: the ANN (IVF hive) tier must
match the brute tier exactly under full probe, read only the probed
dirs under partial probe, and rebuild with the layer's lineage."""

import dataclasses
import os
import shutil

import numpy as np
import pytest

from blarify_ray.config import DEFAULT_CONFIG
from blarify_ray.pipelines.doc_layer import (
    _probe_files,
    doc_search,
    doc_search_hybrid,
    ensure_doc_ann,
    ensure_doc_layer,
    hash_embed,
)
from blarify_ray.pipelines.kg_build import build_kg

N = 60
OUT = "/tmp/blarify_ray_test_doc_ann"


@pytest.fixture(scope="module")
def built():
    shutil.rmtree(OUT, ignore_errors=True)
    return build_kg(OUT, N)


def _rows(ds):
    return [
        (r["entity_id"], r["name"], r["score"]) for r in ds.take_all()
    ]


def test_ann_full_probe_equals_brute(built):
    """Forced ANN tier (doc_search_brute_max=0) with nprobe >= cells is
    a FULL probe — exact brute force over a different layout, so the
    top-k must equal the brute tier's row for row (ids, names, scores)
    for both the vector and the hybrid search."""
    query = "data systems"
    brute = dataclasses.replace(DEFAULT_CONFIG, doc_search_brute_max=10**9)
    ann = dataclasses.replace(
        DEFAULT_CONFIG, doc_search_brute_max=0, doc_ann_cells=8, doc_ann_nprobe=8
    )
    assert _rows(doc_search(built, query, k=10, cfg=brute)) == _rows(
        doc_search(built, query, k=10, cfg=ann)
    )
    hb = doc_search_hybrid(built, query, k=10, cfg=brute).take_all()
    ha = doc_search_hybrid(built, query, k=10, cfg=ann).take_all()
    assert [
        (r["entity_id"], r["score"], r["vector_score"], r["keyword_score"])
        for r in hb
    ] == [
        (r["entity_id"], r["score"], r["vector_score"], r["keyword_score"])
        for r in ha
    ]


def test_ann_partial_probe_reads_only_probed_dirs(built):
    """nprobe=1 must touch exactly the files under ONE centroid dir — a
    strict subset of the layout — and the search over those files still
    self-retrieves a vector that lives in the probed cell."""
    cfg = dataclasses.replace(
        DEFAULT_CONFIG, doc_search_brute_max=0, doc_ann_cells=8, doc_ann_nprobe=1
    )
    layout, index = ensure_doc_ann(built, cfg)
    all_files = [
        os.path.join(dp, f)
        for dp, _d, fs in os.walk(layout)
        for f in fs
        if f.endswith(".parquet")
    ]
    q = hash_embed("data systems").astype(np.float64)
    files = _probe_files(layout, index, q, 1)
    assert files and len(files) < len(all_files)
    dirs = {os.path.dirname(f) for f in files}
    assert len({d.split("centroid=")[-1] for d in dirs}) == 1
    # the probed dirs ARE what doc_search reads: its top hit's embedding
    # must live in one of the probed files
    hits = doc_search(built, "data systems", k=3, cfg=cfg).take_all()
    assert hits  # non-empty result from the probed fraction alone
    import pyarrow.parquet as pq

    probed_ids = set()
    for f in files:
        probed_ids |= set(pq.read_table(f, columns=["entity_id"])["entity_id"].to_pylist())
    assert hits[0]["entity_id"] in probed_ids


def test_ann_layout_checkpoint_reused(built):
    """Second ensure_doc_ann with the same layer lineage reuses the
    layout (manifest skip), and the layout is invalidated when the cell
    count changes (lineage includes the knob)."""
    cfg = dataclasses.replace(DEFAULT_CONFIG, doc_ann_cells=8)
    layout1, _ = ensure_doc_ann(built, cfg)
    man = os.path.join(os.path.dirname(layout1.rstrip(os.sep)), "_MANIFEST.json")
    before = os.path.getmtime(man)
    layout2, _ = ensure_doc_ann(built, cfg)
    assert layout2 == layout1
    assert os.path.getmtime(man) == before
    cfg2 = dataclasses.replace(DEFAULT_CONFIG, doc_ann_cells=4)
    ensure_doc_ann(built, cfg2)
    assert os.path.getmtime(man) > before


def test_self_retrieval_through_ann_tier(built):
    """A query equal to an entity's exact content must rank that entity
    first through the ANN tier at default nprobe (its own cell is always
    the nearest centroid probed first)."""
    from blarify_ray.pipelines.doc_layer import build_doc_layer

    cfg = dataclasses.replace(
        DEFAULT_CONFIG, doc_search_brute_max=0, doc_ann_cells=8, doc_ann_nprobe=2
    )
    target = build_doc_layer(built).take_all()[0]
    hits = doc_search(built, target["content"], k=3, cfg=cfg).take_all()
    assert hits[0]["entity_id"] == target["entity_id"]
    assert hits[0]["score"] == pytest.approx(1.0, abs=1e-5)
