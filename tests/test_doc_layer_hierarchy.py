"""Documentation layer, vector search over it, bottom-up rollup, mermaid
render, and the generic as-of / interval join ops."""

import shutil
from urllib.parse import urlparse

import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from blarify_ray.ops.joins import asof_join, interval_join
from blarify_ray.pipelines.doc_layer import EMBED_DIM, build_doc_layer, doc_search, hash_embed
from blarify_ray.pipelines.graph_queries import render_mermaid
from blarify_ray.pipelines.hierarchy import bottom_up_rollup
from blarify_ray.pipelines.kg_build import build_kg
from blarify_ray.state.manifest import read_stage

N = 60
OUT = "/tmp/blarify_ray_test_dl"


@pytest.fixture(scope="module")
def built():
    shutil.rmtree(OUT, ignore_errors=True)
    return build_kg(OUT, N)


def test_doc_layer_rows_and_embeddings(built):
    layer = build_doc_layer(built).take_all()
    n_ents = read_stage(built["entities"]).count()
    assert len(layer) == n_ents
    r = layer[0]
    assert r["layer"] == "documentation" and len(r["content_embedding"]) == EMBED_DIM
    assert r["name"] in r["content"]
    # embedding is the deterministic stub of the content
    assert list(hash_embed(r["content"])) == pytest.approx(list(r["content_embedding"]))


def test_doc_search_self_retrieval(built):
    layer = build_doc_layer(built).take_all()
    target = layer[0]
    # querying with the exact content puts that entity at rank 1 (cos=1)
    hits = doc_search(built, target["content"], k=3).take_all()
    assert hits[0]["entity_id"] == target["entity_id"]
    assert hits[0]["score"] == pytest.approx(1.0, abs=1e-5)


def test_doc_layer_checkpoint_no_reembed(built):
    """The doc layer is a manifest-tracked stage: the first search builds
    it, every later search reuses the parquet (no re-summarize/re-embed),
    and the checkpointed search returns the same rows as a direct scan."""
    import os

    from blarify_ray.pipelines.doc_layer import ensure_doc_layer

    _, skipped0 = ensure_doc_layer(built)  # may build or reuse
    path, skipped1 = ensure_doc_layer(built)
    assert skipped1 is True  # second call reuses the checkpoint
    assert os.path.isdir(path) and read_stage(path).count() > 0

    target = build_doc_layer(built).take_all()[0]
    before = os.path.getmtime(os.path.join(path, "_MANIFEST.json"))
    hits = doc_search(built, target["content"], k=3).take_all()
    assert hits[0]["entity_id"] == target["entity_id"]
    # the search scanned the checkpoint, it did not rebuild it
    assert os.path.getmtime(os.path.join(path, "_MANIFEST.json")) == before


class MarkerEmbedder:
    """HashEmbedder variant whose first component is a run marker:
    carried-forward rows keep the OLD marker, recomputed rows get the NEW
    one — direct evidence of which rows met the embedder. Same
    fingerprint for any marker (class qualname/dim), so the delta path
    treats two instances as the same service."""

    def __new__(cls, marker):
        from blarify_ray.pipelines.doc_layer import EMBED_DIM
        from blarify_ray.services import HashEmbedder

        class _Marker(HashEmbedder):
            def __init__(self, m):
                super().__init__(EMBED_DIM)
                self.m = m

            def _embed_batch(self, texts):
                out = super()._embed_batch(texts)
                out[:, 0] = self.m
                return out

            def fingerprint(self):
                return f"MarkerEmbedder/d{self.dim}"

        return _Marker(marker)


def test_doc_layer_delta_rebuild_targets_changed_entities():
    """Targeted invalidation: after an incremental corpus update, only
    entities whose inputs changed are re-embedded; unchanged rows are
    carried forward byte-identical (they never meet the embedder)."""
    import json
    import os

    from blarify_ray.pipelines.doc_layer import (
        ensure_doc_layer,
        entity_content_key,
    )
    from blarify_ray.pipelines.incremental import incremental_update

    out = "/tmp/blarify_ray_test_dl_delta"
    shutil.rmtree(out, ignore_errors=True)
    p1 = build_kg(out, N)
    path1, _ = ensure_doc_layer(p1, embedder=MarkerEmbedder(1.0))
    rows1 = {r["entity_id"]: r for r in read_stage(path1).take_all()}
    assert all(r["content_embedding"][0] == 1.0 for r in rows1.values())
    keys1 = {
        r["entity_id"]: entity_content_key(
            r["name"], r["type"], r["aliases"], r["n_mentions"]
        )
        for r in read_stage(p1["entities"]).take_all()
    }

    p2 = incremental_update(out, N, [6, 20], content_seed=99)
    path2, skipped = ensure_doc_layer(p2, embedder=MarkerEmbedder(2.0))
    assert not skipped
    with open(os.path.join(path2, "_MANIFEST.json")) as f:
        assert json.load(f)["delta"] is True
    keys2 = {
        r["entity_id"]: entity_content_key(
            r["name"], r["type"], r["aliases"], r["n_mentions"]
        )
        for r in read_stage(p2["entities"]).take_all()
    }
    rows2 = {r["entity_id"]: r for r in read_stage(path2).take_all()}
    assert set(rows2) == set(keys2)  # one row per current entity, none deleted
    unchanged = {e for e, k in keys2.items() if keys1.get(e) == k}
    changed = set(keys2) - unchanged
    assert unchanged and changed, "update must change SOME but not ALL entities"
    for e in unchanged:  # carried forward byte-identical, old marker
        assert rows2[e]["content_embedding"][0] == 1.0
        assert list(rows2[e]["content_embedding"]) == list(rows1[e]["content_embedding"])
        assert rows2[e]["content"] == rows1[e]["content"]
    for e in changed:  # recomputed with the new run's embedder
        assert rows2[e]["content_embedding"][0] == 2.0


def test_doc_layer_delta_equals_full_rebuild():
    """With the default services, the delta-built checkpoint must equal a
    from-scratch full build row-for-row, and search works over it."""
    from blarify_ray.pipelines.doc_layer import build_doc_layer, ensure_doc_layer
    from blarify_ray.pipelines.incremental import incremental_update

    out = "/tmp/blarify_ray_test_dl_delta2"
    shutil.rmtree(out, ignore_errors=True)
    p1 = build_kg(out, N)
    ensure_doc_layer(p1)
    p2 = incremental_update(out, N, [6, 20], content_seed=99)
    path2, _ = ensure_doc_layer(p2)

    def as_set(rows):
        return {
            (r["entity_id"], r["content"], tuple(r["content_embedding"]))
            for r in rows
        }

    assert as_set(read_stage(path2).take_all()) == as_set(
        build_doc_layer(p2).take_all()
    )
    target = build_doc_layer(p2).take_all()[0]
    hits = doc_search(p2, target["content"], k=3).take_all()
    assert hits[0]["entity_id"] == target["entity_id"]


def test_service_retry_and_fallback_chain():
    """Summarizer/Embedder ABC semantics: retry covers transient provider
    failures, the chain falls through to the next provider on permanent
    ones, and exhausting the chain raises."""
    import numpy as np
    import pytest as _pytest

    from blarify_ray.services import (
        Embedder,
        RetryPolicy,
        ServiceError,
        Summarizer,
        SummarizerChain,
        TemplateSummarizer,
    )

    rows = [{"name": "X", "type": "ORG", "aliases": [], "n_mentions": 1}]

    class Flaky(Summarizer):
        retry = RetryPolicy(max_attempts=3, backoff_base_s=0.0)

        def __init__(self, fail_times):
            self.fail_times = fail_times
            self.calls = 0

        def _summarize_batch(self, rows):
            self.calls += 1
            if self.calls <= self.fail_times:
                raise ConnectionError("transient")
            return [f"flaky:{r['name']}" for r in rows]

    # transient failures are retried away
    f = Flaky(fail_times=2)
    assert f.summarize_batch(rows) == ["flaky:X"]
    assert f.calls == 3

    # permanent failure exhausts retries and raises ServiceError
    dead = Flaky(fail_times=10)
    with _pytest.raises(ServiceError):
        dead.summarize_batch(rows)

    # the chain rotates to the next provider per batch
    chain = SummarizerChain([Flaky(fail_times=10), TemplateSummarizer()])
    out = chain.summarize_batch(rows)
    assert out == ["ORG entity 'X'; 1 mentions in the corpus."]

    # every provider dead → ServiceError
    with _pytest.raises(ServiceError):
        SummarizerChain([Flaky(fail_times=10)]).summarize_batch(rows)

    # embedder shape contract is enforced
    class BadDim(Embedder):
        dim = 8
        retry = RetryPolicy(max_attempts=1, backoff_base_s=0.0)

        def _embed_batch(self, texts):
            return np.zeros((len(texts), 4), dtype=np.float32)

    with _pytest.raises(ServiceError):
        BadDim().embed_batch(["a"])


def test_bottom_up_rollup_matches_direct(built):
    rollup = bottom_up_rollup(built).take_all()
    docs = read_stage(built["docs"], columns=["url", "n_sents"]).take_all()
    # direct single-pass check for one domain and one tld
    by_domain: dict[str, int] = {}
    for d in docs:
        by_domain[urlparse(d["url"]).netloc] = by_domain.get(urlparse(d["url"]).netloc, 0) + 1
    lv1 = {r["node"]: r["n_docs"] for r in rollup if r["level"] == 1}
    assert lv1 == by_domain
    lv2 = {r["node"]: r["n_docs"] for r in rollup if r["level"] == 2}
    assert sum(lv2.values()) == len(docs)
    root = [r for r in rollup if r["level"] == 3]
    assert len(root) == 1 and root[0]["n_docs"] == len(docs)


def test_render_skeleton_tree_golden_structure(built):
    """The indented tree must mirror the rollup exactly: every tld under
    the root, every domain under its tld, box-drawing prefixes with └──
    on last children, counts from the rollup rows, and a deterministic
    elision line when max_children caps fan-out."""
    from blarify_ray.pipelines.graph_queries import render_skeleton_tree

    rollup = bottom_up_rollup(built).take_all()
    lines = render_skeleton_tree(built)
    assert lines[0] == "# Corpus Structure" and lines[1] == ""

    root = next(r for r in rollup if r["level"] == max(x["level"] for x in rollup))
    assert lines[2] == f"{root['node']}/  # ROOT [docs: {root['n_docs']}]"

    # every tld and domain appears exactly once, with its count
    body = "\n".join(lines)
    for r in rollup:
        if r["level"] == root["level"]:
            continue
        t = "TLD" if r["level"] == root["level"] - 1 else "DOMAIN"
        hits = [ln for ln in lines if f" {r['node']}" in ln and f"# {t} [docs: {r['n_docs']}]" in ln]
        assert len(hits) == 1, (r, hits)
    assert "├── " in body and "└── " in body

    # child ordering: per parent, largest n_docs first (tie → name)
    tlds = sorted(
        (r for r in rollup if r["level"] == root["level"] - 1),
        key=lambda r: (-r["n_docs"], r["node"]),
    )
    tld_lines = [ln for ln in lines if "# TLD" in ln]
    assert [ln.split("/  #")[0].split("── ")[-1] for ln in tld_lines] == [
        r["node"] for r in tlds
    ]
    # the LAST tld uses └──, earlier ones ├──
    assert tld_lines[-1].lstrip().startswith("└── ")
    for ln in tld_lines[:-1]:
        assert ln.lstrip().startswith("├── ")

    # elision: max_children=1 keeps one domain per tld + an elision line
    capped = render_skeleton_tree(built, max_children=1)
    n_domains = sum(1 for r in rollup if r["level"] == 1)
    if n_domains > len(tlds):
        assert any("more)" in ln for ln in capped)
    shown = sum(1 for ln in capped if "# DOMAIN" in ln)
    assert shown == min(1, n_domains) * len(tlds) or shown <= len(tlds)


def test_skeleton_tree_tool_registered(built):
    from blarify_ray.tools import call_tool, list_tools

    assert any(t["name"] == "skeleton_tree" for t in list_tools())
    out = call_tool(built, "skeleton_tree", {"max_children": 3})
    assert isinstance(out, str) and out.startswith("# Corpus Structure")


def test_render_mermaid(built):
    edge = read_stage(built["edges"]).take(1)[0]
    lines = render_mermaid(built, edge["src_id"])
    assert lines[0] == "graph TD" and len(lines) > 1
    assert any("-->" in ln for ln in lines[1:])


def test_render_mermaid_depth_n(built):
    """depth=2 renders a superset of the 1-hop edges: every 1-hop line
    is present, plus edges among nodes discovered at hop 2."""
    from blarify_ray.pipelines.graph_queries import k_hop

    edge = read_stage(built["edges"]).take(1)[0]
    seed = edge["src_id"]
    one = render_mermaid(built, seed)
    two = render_mermaid(built, seed, depth=2)
    assert set(one[1:]) <= set(two[1:])
    reach = k_hop(built, [seed], max_depth=2).take_all()
    if any(r["depth"] == 2 for r in reach):
        assert len(set(two[1:])) > len(set(one[1:]))


def test_asof_join_generic():
    left = rd.from_arrow(
        pa.table(
            {
                "k": [1, 1, 2, 3],
                "lts": pd.to_datetime(["2024-01-05", "2024-01-01", "2024-01-05", "2024-01-05"]),
            }
        )
    )
    right = rd.from_arrow(
        pa.table(
            {
                "k": [1, 1, 2],
                "rts": pd.to_datetime(["2024-01-02", "2024-01-04", "2024-01-06"]),
                "val": [10, 20, 30],
            }
        )
    )
    out = asof_join(left, right, key="k", left_ts="lts", right_ts="rts", right_cols=["rts", "val"]).take_all()
    by = {(r["k"], str(r["lts"])[:10]): r["val"] for r in out}
    assert by[(1, "2024-01-05")] == 20  # most recent of the two
    assert pd.isna(by[(1, "2024-01-01")])  # nothing at/before
    assert pd.isna(by[(2, "2024-01-05")])  # right side only after
    assert pd.isna(by[(3, "2024-01-05")])  # key absent on right


def test_interval_join_innermost():
    points = rd.from_arrow(pa.table({"k": ["a", "a", "b"], "pos": [5, 50, 5]}))
    intervals = rd.from_arrow(
        pa.table(
            {
                "k": ["a", "a", "b"],
                "start": [0, 10, 100],
                "end": [10, 20, 200],
                "label": ["first", "second", "other"],
            }
        )
    )
    out = interval_join(
        points, intervals, key="k", point_col="pos", start_col="start",
        end_col="end", payload_cols=["label"],
    ).take_all()
    got = {(r["k"], r["pos"]): r["label"] for r in out}
    assert got == {("a", 5): "first"}  # 50 outside all; b:5 outside
