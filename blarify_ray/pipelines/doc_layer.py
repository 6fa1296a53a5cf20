"""Documentation layer — the reference's derived LLM/embedding layer
re-expressed for the web-KG: one DocumentationNode-shaped row per
entity with a content summary and a content embedding
(``blarify/graph/node/documentation_node.py:17-68``,
``blarify/services/embedding_service.py``).

Summaries and embeddings go through the pluggable service boundary
(``services.Summarizer`` / ``services.Embedder`` — batching, retry,
backoff, fallback chain); the default impls are the deterministic
offline stubs. The layer is a MANIFEST-TRACKED STAGE: ``ensure_doc_layer``
builds it once per (entities lineage × service fingerprints) and
``doc_search`` / ``doc_search_hybrid`` scan its parquet — a query never
re-summarizes or re-embeds the corpus (the reference's embed-once
semantics, ``embedding_service.py:97-144``)."""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pyarrow as pa
import ray.data

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..services import Embedder, HashEmbedder, Summarizer, TemplateSummarizer
from ..state.manifest import lineage_hash, read_manifest, read_stage, run_stage
from ..util import pool_size

EMBED_DIM = 64

_DEFAULT_EMBEDDER = HashEmbedder(EMBED_DIM)
_DEFAULT_SUMMARIZER = TemplateSummarizer()


def hash_embed(text: str) -> np.ndarray:
    """Single-text convenience over the stub ``HashEmbedder`` (kept for
    query-side embedding and tests)."""
    return _DEFAULT_EMBEDDER.embed_batch([text])[0]


def entity_content(name: str, etype: str, aliases: list[str], n_mentions: int) -> str:
    """Single-row convenience over the stub ``TemplateSummarizer``."""
    return _DEFAULT_SUMMARIZER.summarize_batch(
        [{"name": name, "type": etype, "aliases": aliases, "n_mentions": n_mentions}]
    )[0]


def entity_content_key(name: str, etype: str, aliases: list[str], n_mentions: int) -> str:
    """Fingerprint of the doc-layer INPUT tuple for one entity — the
    delta-rebuild change detector (the service fingerprints are guarded
    separately by the stage manifest)."""
    blob = repr((name, etype, [str(a) for a in aliases], int(n_mentions)))
    return hashlib.md5(blob.encode("utf-8")).hexdigest()


class DocLayerBuilder:
    """Actor-pool stage: summary + embedding per entity through the
    service ABCs, with a per-actor content-hash cache (embed-once dedup,
    ``embedding_service.py:97-144``). Services are constructed into the
    actor once (``__init__``), not per batch."""

    def __init__(self, summarizer: Summarizer | None = None, embedder: Embedder | None = None):
        self.summarizer = summarizer or TemplateSummarizer()
        self.embedder = embedder or HashEmbedder(EMBED_DIM)
        self._cache: dict[bytes, np.ndarray] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = [
            {"name": n, "type": t, "aliases": a, "n_mentions": m}
            for n, t, a, m in zip(
                batch["name"].to_pylist(), batch["type"].to_pylist(),
                batch["aliases"].to_pylist(), batch["n_mentions"].to_pylist(),
            )
        ]
        contents = self.summarizer.summarize_batch(rows)
        # embed-once dedup: only cache-miss contents reach the embedder,
        # each distinct content exactly once per actor
        keys = [hashlib.md5(c.encode()).digest() for c in contents]
        miss = [(k, c) for k, c in dict(zip(keys, contents)).items() if k not in self._cache]
        if miss:
            vecs = self.embedder.embed_batch([c for _, c in miss])
            for (k, _), v in zip(miss, vecs):
                self._cache[k] = v
        dim = self.embedder.dim
        flat = (
            np.concatenate([self._cache[k] for k in keys])
            if keys else np.array([], dtype=np.float32)
        )
        return pa.Table.from_pydict(
            {
                "entity_id": batch["entity_id"],
                "name": batch["name"],
                "info_type": pa.array(["entity_summary"] * batch.num_rows, pa.string()),
                "layer": pa.array(["documentation"] * batch.num_rows, pa.string()),
                "content": pa.array(contents, pa.string()),
                "content_embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(flat, pa.float32()), dim
                ),
                "content_key": pa.array(
                    [
                        entity_content_key(
                            r["name"], r["type"], r["aliases"], r["n_mentions"]
                        )
                        for r in rows
                    ],
                    pa.string(),
                ),
            }
        )


_ENT_COLS = ["entity_id", "name", "type", "aliases", "n_mentions"]
_LAYER_COLS = [
    "entity_id", "name", "info_type", "layer", "content",
    "content_embedding", "content_key",
]

# a delta rebuild broadcasts the changed-id and dropped-id sets (both
# DELTA-scale — the whole point of targeted invalidation); if an update
# touched more ids than this, a full rebuild is cheaper and bounded
DOC_DELTA_BROADCAST_MAX = 5_000_000


def build_doc_layer(
    paths: dict[str, str],
    cfg: PipelineConfig = DEFAULT_CONFIG,
    summarizer: Summarizer | None = None,
    embedder: Embedder | None = None,
) -> ray.data.Dataset:
    """Streaming (un-checkpointed) FULL form — used by the stage producer
    and directly by tests."""
    ents = read_stage(paths["entities"], columns=_ENT_COLS)
    return ents.map_batches(
        DocLayerBuilder,
        fn_constructor_kwargs={"summarizer": summarizer, "embedder": embedder},
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=pool_size(4),
        num_cpus=1,
    )


def _norm_emb(t: pa.Table) -> pa.Table:
    """Normalize the embedding column to list<float32> so carried-forward
    (parquet-read) and freshly-built (FixedSizeList) rows union cleanly."""
    import pyarrow.compute as pc

    i = t.schema.get_field_index("content_embedding")
    return t.set_column(
        i, "content_embedding", pc.cast(t["content_embedding"], pa.list_(pa.float32()))
    ).select(_LAYER_COLS)


def build_doc_layer_delta(
    paths: dict[str, str],
    prev_layer_path: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    summarizer: Summarizer | None = None,
    embedder: Embedder | None = None,
) -> ray.data.Dataset | None:
    """TARGETED invalidation (the reference resets processing state only
    for changed nodes and resumes, ``documentation_creator.py:213-260``,
    ``batch_processing_queries.py:350-402``): re-summarize/re-embed ONLY
    entities whose input tuple changed since the previous checkpoint;
    carry every unchanged row forward untouched (the carried rows never
    meet the services — at entity-scale × an LLM call, this is the
    difference between minutes and days on an incremental update).

    Scale shape: two co-partitioned attaches over (entity_id,
    content_key) PROJECTIONS (fixed-width, never the embedding), then
    delta-scale id broadcasts prune two map-only scans. Returns ``None``
    when the delta exceeds ``DOC_DELTA_BROADCAST_MAX`` (caller falls back
    to the bounded full rebuild)."""
    import pyarrow.compute as pc
    import ray as _ray

    from ..ops.joins import copartition_attach
    from ..util import get_broadcast

    def keyed_ents(t: pa.Table) -> pa.Table:
        keys = [
            entity_content_key(n, ty, a, m)
            for n, ty, a, m in zip(
                t["name"].to_pylist(), t["type"].to_pylist(),
                t["aliases"].to_pylist(), t["n_mentions"].to_pylist(),
            )
        ]
        return pa.Table.from_pydict(
            {"entity_id": t["entity_id"], "content_key": pa.array(keys, pa.string())}
        )

    keyed = read_stage(paths["entities"], columns=_ENT_COLS).map_batches(
        keyed_ents, batch_format="pyarrow"
    )
    prev_keys = read_stage(prev_layer_path, columns=["entity_id", "content_key"])

    # ids to REBUILD: new or input-changed entities
    changed = copartition_attach(
        keyed, prev_keys, "entity_id", "entity_id", {"content_key": "_prev_key"},
        how="left",
    ).map_batches(
        lambda t: t.filter(
            pc.or_kleene(
                pc.is_null(t["_prev_key"]),
                pc.not_equal(t["content_key"], t["_prev_key"]),
            )
        ).select(["entity_id"]),
        batch_format="pyarrow",
    )
    # previous rows to DROP: deleted or changed entities
    drop = copartition_attach(
        prev_keys, keyed, "entity_id", "entity_id", {"content_key": "_new_key"},
        how="left",
    ).map_batches(
        lambda t: t.filter(
            pc.or_kleene(
                pc.is_null(t["_new_key"]),
                pc.not_equal(t["content_key"], t["_new_key"]),
            )
        ).select(["entity_id"]),
        batch_format="pyarrow",
    )

    # size-gate with COUNTS before any driver materialization — an
    # oversized delta must bail to the full rebuild without first
    # pulling millions of id strings onto the driver
    changed = changed.materialize()
    if changed.count() > DOC_DELTA_BROADCAST_MAX:
        return None
    drop = drop.materialize()
    if drop.count() > DOC_DELTA_BROADCAST_MAX:
        return None
    changed_ids = sorted(r["entity_id"] for r in changed.take_all())
    drop_ids = sorted(r["entity_id"] for r in drop.take_all())
    changed_ref = _ray.put(pa.array(changed_ids, pa.string()))
    drop_ref = _ray.put(pa.array(drop_ids, pa.string()))

    def prune_changed(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.is_in(t["entity_id"], value_set=get_broadcast(changed_ref))
        )

    rebuilt = (
        read_stage(paths["entities"], columns=_ENT_COLS)
        .map_batches(prune_changed, batch_format="pyarrow")
        .map_batches(
            DocLayerBuilder,
            fn_constructor_kwargs={"summarizer": summarizer, "embedder": embedder},
            batch_format="pyarrow",
            batch_size=1024,
            concurrency=pool_size(4),
            num_cpus=1,
        )
        .map_batches(_norm_emb, batch_format="pyarrow")
    )

    def prune_carried(t: pa.Table) -> pa.Table:
        return t.filter(
            pc.invert(pc.is_in(t["entity_id"], value_set=get_broadcast(drop_ref)))
        )

    carried = (
        read_stage(prev_layer_path, columns=_LAYER_COLS)
        .map_batches(prune_carried, batch_format="pyarrow")
        .map_batches(_norm_emb, batch_format="pyarrow")
    )
    return carried.union(rebuilt)


def ensure_doc_layer(
    paths: dict[str, str],
    cfg: PipelineConfig = DEFAULT_CONFIG,
    summarizer: Summarizer | None = None,
    embedder: Embedder | None = None,
) -> tuple[str, bool]:
    """Build-or-reuse the doc-layer checkpoint next to the other stage
    dirs. Lineage = entities stage lineage × service fingerprints (plus
    the package code digest via ``lineage_hash``), so a new build, a
    swapped service impl, or a code change each invalidate the cache.

    Invalidation is TARGETED: when the entities lineage changed but the
    services (and code) did not, the producer delta-rebuilds against the
    previous checkpoint — only changed entities are re-summarized /
    re-embedded (``build_doc_layer_delta``); a service/code change or a
    missing base forces the full rebuild. Returns ``(stage_path,
    skipped)`` — ``skipped`` is True when the existing checkpoint was
    reused as-is (no work at all)."""
    out_dir = os.path.dirname(paths["entities"].rstrip(os.sep))
    ent_man = read_manifest(out_dir, "entities") or {}
    s = summarizer or _DEFAULT_SUMMARIZER
    e = embedder or _DEFAULT_EMBEDDER
    lin = lineage_hash(
        "doc_layer", ent_man.get("lineage", "none"), s.fingerprint(), e.fingerprint()
    )
    # svc_key goes through lineage_hash, so it also carries the package
    # code digest — a code change disables delta reuse of an old base
    svc_key = lineage_hash("doc_layer_services", s.fingerprint(), e.fingerprint())
    prev_man = read_manifest(out_dir, "doc_layer")
    layer_dir = os.path.join(out_dir, "doc_layer")
    can_delta = bool(
        prev_man
        and prev_man.get("lineage") != lin
        and prev_man.get("svc_key") == svc_key
        and os.path.isdir(layer_dir)
    )
    # mutated by produce(); run_stage merges it into the manifest AFTER
    # the producer runs, so the recorded "delta" reflects what happened
    metrics = {"svc_key": svc_key, "delta": False}

    def produce(tmp: str) -> None:
        ds = None
        if can_delta:
            ds = build_doc_layer_delta(paths, layer_dir, cfg, summarizer, embedder)
            metrics["delta"] = ds is not None
        if ds is None:
            ds = build_doc_layer(paths, cfg, summarizer, embedder).map_batches(
                _norm_emb, batch_format="pyarrow"
            )
        ds.write_parquet(tmp)

    return run_stage(out_dir, "doc_layer", lin, produce, metrics=metrics)


def _read_layer(
    paths: dict[str, str], cfg: PipelineConfig
) -> ray.data.Dataset:
    layer_path, _ = ensure_doc_layer(paths, cfg)
    return read_stage(
        layer_path, columns=["entity_id", "name", "content", "content_embedding"]
    )


def _layer_rows(layer_path: str) -> int:
    """Doc-layer row count from parquet FOOTERS only — the search-tier
    probe must not read column data."""
    import glob

    import pyarrow.parquet as pq

    return sum(
        pq.read_metadata(f).num_rows
        for f in glob.glob(os.path.join(layer_path, "*.parquet"))
    )


def ensure_doc_ann(paths: dict[str, str], cfg: PipelineConfig = DEFAULT_CONFIG):
    """Build-or-reuse the IVF hive layout over the doc layer — the
    persisted ANN index for entity-scale vector search. Manifest-tracked
    like every derived stage: lineage = doc-layer lineage × cell count
    (plus the package code digest), so a rebuilt or delta-refreshed
    layer invalidates the layout. ZERO-SHUFFLE write: one streaming
    assign pass hive-splits batches across centroid dirs
    (``ops/similarity.IvfIndex.write_partitioned``, the ``edges_by_dst``
    pattern). Returns ``(layout_dir, IvfIndex)``."""
    from ..ops.similarity import IvfIndex

    layer_path, _ = ensure_doc_layer(paths, cfg)
    out_dir = os.path.dirname(layer_path.rstrip(os.sep))
    lay_man = read_manifest(out_dir, "doc_layer") or {}
    lin = lineage_hash("doc_ann", lay_man.get("lineage", "none"), cfg.doc_ann_cells)

    def produce(tmp: str) -> None:
        layer = read_stage(
            layer_path,
            columns=["entity_id", "name", "content", "content_embedding"],
        )
        idx = IvfIndex.train(layer, cfg.doc_ann_cells, emb_col="content_embedding")
        idx.write_partitioned(
            layer, os.path.join(tmp, "ivf"), emb_col="content_embedding"
        )
        # "_"-prefixed: parquet dataset discovery (run_stage row count)
        # ignores it, like "_MANIFEST.json"
        np.save(os.path.join(tmp, "_centroids.npy"), idx.centroids)

    ann_path, _ = run_stage(out_dir, "doc_ann", lin, produce)
    cents = np.load(os.path.join(ann_path, "_centroids.npy"))
    return os.path.join(ann_path, "ivf"), IvfIndex(cents)


def _probe_files(layout_dir: str, index, qvec: np.ndarray, nprobe: int) -> list[str]:
    """Parquet files under the ≤ nprobe probed centroid dirs — the exact
    byte surface an ANN-tier query reads (exposed for tests)."""
    import glob

    dirs = index.probe_dirs(layout_dir, qvec, nprobe)
    return sorted(f for d in dirs for f in glob.glob(os.path.join(d, "*.parquet")))


def _search_candidates(
    paths: dict[str, str], qvec: np.ndarray, cfg: PipelineConfig, columns: list[str]
) -> ray.data.Dataset:
    """Candidate rows for one vector query, size-tiered: at or below
    ``cfg.doc_search_brute_max`` layer rows the whole checkpoint scans
    (exact); above it only the ``doc_ann_nprobe`` probed IVF dirs are
    read — per-query bytes shrink to the probed fraction of the corpus.
    ``doc_ann_nprobe >= doc_ann_cells`` makes the ANN tier exact (full
    probe), which is how the forced-tier parity test pins equality."""
    layer_path, _ = ensure_doc_layer(paths, cfg)
    if _layer_rows(layer_path) <= cfg.doc_search_brute_max:
        return read_stage(layer_path, columns=columns)
    layout_dir, index = ensure_doc_ann(paths, cfg)
    files = _probe_files(layout_dir, index, qvec, cfg.doc_ann_nprobe)
    if not files:
        return read_stage(layer_path, columns=columns).limit(0)
    return ray.data.read_parquet(files, columns=columns)


def doc_search(
    paths: dict[str, str], query_text: str, k: int = 10,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> ray.data.Dataset:
    """Vector search over the documentation layer: embed the query with
    the same (stub) model, cosine top-k (``queries.py:2298-2356``
    analog). Only the query string is embedded per call. Size-tiered on
    ``cfg.doc_search_brute_max``: small layers brute-force scan the
    checkpoint; large layers read ONLY the probed dirs of the
    manifest-tracked IVF layout (``ensure_doc_ann``)."""
    q = hash_embed(query_text).astype(np.float64)
    layer = _search_candidates(
        paths, q, cfg, ["entity_id", "name", "content_embedding"]
    )

    def score(t: pa.Table) -> pa.Table:
        from ..ops.similarity import _mat

        m = _mat(t["content_embedding"])
        sims = m @ q if len(m) else np.zeros(0)
        return pa.Table.from_pydict(
            {
                "entity_id": t["entity_id"],
                "name": t["name"],
                "score": pa.array(np.round(sims, 6)),
            }
        )

    return layer.map_batches(score, batch_format="pyarrow").sort(
        ["score", "entity_id"], descending=[True, False]
    ).limit(k)


def doc_search_hybrid(
    paths: dict[str, str], query_text: str, k: int = 10,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    w_vector: float = 0.7, w_keyword: float = 0.3,
) -> ray.data.Dataset:
    """Hybrid vector+keyword search over the documentation layer:
    ``score = 0.7·cosine + 0.3·keyword`` with a name/title boost —
    the reference's combined scoring
    (``blarify/repositories/graph_db_manager/queries.py:2322-2356``:
    vector similarity blended with keyword hits, title matches boosted
    over content matches). Scans the doc-layer CHECKPOINT.

    Keyword score per entity = (2·name_hits + content_hits) / (2·terms),
    clipped to 1 — a term matching the entity NAME counts double
    (title boost), a term matching only the summary content counts once;
    the /(2·terms) normalization makes an all-name-hit query score
    exactly 1.0.

    Size-tiered like ``doc_search``; in the ANN tier the candidate set
    is the VECTOR-probed cells (a keyword-only hit outside the probed
    cells is missed — standard hybrid-over-ANN semantics; full probe
    restores exactness).
    """
    from ..text import normalize_surface

    q = hash_embed(query_text).astype(np.float64)
    terms = [t for t in normalize_surface(query_text).split() if len(t) >= 3]
    layer = _search_candidates(
        paths, q, cfg, ["entity_id", "name", "content", "content_embedding"]
    )

    def score(t: pa.Table) -> pa.Table:
        from ..ops.similarity import _mat

        m = _mat(t["content_embedding"])
        cos = m @ q if len(m) else np.zeros(0)
        kws = []
        for name, content in zip(t["name"].to_pylist(), t["content"].to_pylist()):
            if not terms:
                kws.append(0.0)
                continue
            nl, cl = normalize_surface(name), normalize_surface(content)
            hits = 0
            for term in terms:
                if term in nl:
                    hits += 2  # title/name boost
                elif term in cl:
                    hits += 1
            kws.append(min(1.0, hits / (2.0 * len(terms))))
        hybrid = w_vector * cos + w_keyword * np.asarray(kws)
        return pa.Table.from_pydict(
            {
                "entity_id": t["entity_id"],
                "name": t["name"],
                "score": pa.array(np.round(hybrid, 6)),
                "vector_score": pa.array(np.round(cos, 6)),
                "keyword_score": pa.array(np.round(np.asarray(kws), 6)),
            }
        )

    return layer.map_batches(score, batch_format="pyarrow").sort(
        ["score", "entity_id"], descending=[True, False]
    ).limit(k)
