"""S2–S4 fused: mention detection (gazetteer + heuristic NER), triple
extraction (connector patterns) and entity linking (alias dictionary +
page-context disambiguation) in ONE actor-pool ``map_batches`` stage.

The Gazetteer is the stateful per-worker resource: built once per actor
in ``__init__`` from a broadcast entity list (``ray.put`` once on the
driver, read from the object store by every actor) — the actor-pool
pattern mirroring the reference's LSP server pool
(``blarify/code_references/lsp_helper.py:205-244``) and its SCIP
in-memory symbol join (``scip_helper.py:748-923``).

Output is ``MENTIONS_RESOLVED``: one row per mention; subject mentions
carry their triple annotation inline, so the downstream triples table is
a zero-extra-compute vectorized projection.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..linking import resolve_mention_keys
from ..rules import Gazetteer, extract_triples_from_sentence
from ..schemas import MENTIONS_RESOLVED, TRIPLES_LINKED
from ..text import scope_snippet, split_sentences


_GAZ_CACHE: dict[str, Gazetteer] = {}


def _gazetteer_for(entities_ref) -> Gazetteer:
    """Worker-local cache: deserialize the broadcast entity list and build
    the pair-token index ONCE per worker process (the stateless-task
    analog of actor ``__init__`` state — tasks reuse pre-warmed workers
    instead of spinning a fresh actor pool per build). One generation is
    kept: a new entity universe evicts the old index."""
    key = entities_ref.hex() if hasattr(entities_ref, "hex") else str(id(entities_ref))
    g = _GAZ_CACHE.get(key)
    if g is None:
        entities = (
            entities_ref
            if isinstance(entities_ref, (list, tuple))
            else ray.get(entities_ref)
        )
        _GAZ_CACHE.clear()
        g = _GAZ_CACHE[key] = Gazetteer(tuple(entities))
    return g


class MentionLinker:
    """Callable actor class for ``map_batches(..., concurrency=N)`` — the
    stateful-pool tier (cfg.ner_stateless=False), mirroring the
    reference's LSP server pool (``lsp_helper.py:205-244``)."""

    def __init__(self, entities_ref):
        entities = ray.get(entities_ref) if not isinstance(entities_ref, (list, tuple)) else entities_ref
        self.gaz = Gazetteer(tuple(entities))

    def __call__(self, batch: pa.Table) -> pa.Table:
        return link_batch(self.gaz, batch)


def link_batch(gaz: Gazetteer, batch: pa.Table) -> pa.Table:
    """The S2–S4 per-batch kernel: NER + triples + linking over one
    Arrow batch of docs. Pure function of (gazetteer, batch) — shared by
    the stateless-task and actor-pool tiers."""
    from ..langs import EN, for_lang

    cols: dict[str, list] = {name: [] for name in MENTIONS_RESOLVED.names}

    urls = batch["url"].to_pylist()
    texts = batch["text"].to_pylist()
    raws = batch["raw"].to_pylist()
    langs = (
        batch["lang"].to_pylist()
        if "lang" in batch.column_names
        else ["en"] * batch.num_rows
    )
    for url, text, raw, lang in zip(urls, texts, raws, langs):
        if raw or not text:
            continue
        defs = for_lang(lang) or EN
        sents = split_sentences(text)
        per_sent = []
        page_mentions = []
        for sid, sent in enumerate(sents):
            ms = gaz.find_mentions(sent, defs)
            if ms:
                per_sent.append((sid, sent, ms))
                page_mentions.extend(ms)
        if not page_mentions:
            continue
        keys = resolve_mention_keys(gaz, page_mentions)
        key_by_span: dict[tuple[int, int], tuple[str, str, bool]] = {}
        ki = 0
        for sid, _sent, ms in per_sent:
            for m in ms:
                key_by_span[(sid, m.start)] = keys[ki]
                ki += 1
        for sid, sent, ms in per_sent:
            triple_by_subj = {
                a.start: (pred, b)
                for a, pred, b in extract_triples_from_sentence(sent, ms, defs)
            }
            for m in ms:
                k, t, res = key_by_span[(sid, m.start)]
                tr = triple_by_subj.get(m.start)
                cols["url"].append(url)
                cols["sent_id"].append(sid)
                cols["start"].append(m.start)
                cols["end"].append(m.end)
                cols["surface"].append(m.surface)
                cols["ner_type"].append(m.ner_type)
                cols["key"].append(k)
                cols["etype"].append(t)
                cols["resolved"].append(res)
                if tr is None:
                    cols["pred"].append(None)
                    cols["obj_key"].append(None)
                    cols["obj_type"].append(None)
                    cols["obj_resolved"].append(None)
                    cols["obj_start"].append(None)
                    cols["sent_text"].append(None)
                else:
                    pred, b = tr
                    ok, ot, ores = key_by_span[(sid, b.start)]
                    cols["pred"].append(pred)
                    cols["obj_key"].append(ok)
                    cols["obj_type"].append(ot)
                    cols["obj_resolved"].append(ores)
                    cols["obj_start"].append(b.start)
                    cols["sent_text"].append(scope_snippet(sent))
    return pa.Table.from_pydict(cols, schema=MENTIONS_RESOLVED)


_SHARD_CACHE: dict[str, object] = {}


def _sharded_for(shards_dir: str, max_cached: int):
    """Worker-local ShardedGazetteer (one per shard layout) — shard
    structures LRU inside it; the worker never holds the dictionary."""
    g = _SHARD_CACHE.get(shards_dir)
    if g is None:
        from .gazetteer_shards import ShardedGazetteer

        _SHARD_CACHE.clear()
        g = _SHARD_CACHE[shards_dir] = ShardedGazetteer(
            shards_dir, max_cached=max_cached
        )
    return g


def detect_and_link(
    docs: ray.data.Dataset,
    entities_ref,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    shards_dir: str | None = None,
) -> ray.data.Dataset:
    """docs → MENTIONS_RESOLVED.

    Default tier: stateless tasks + worker-cached Gazetteer — every CPU
    participates and pre-warmed workers skip pool spin-up (the broadcast
    state is read-only, so tasks and actors are semantically identical).
    ``cfg.ner_stateless=False`` selects the actor-pool tier sized by
    ``util.pool_size``. ``shards_dir`` (set by the caller when the
    entity universe exceeds ``cfg.gazetteer_broadcast_max``) selects the
    SHARDED-dictionary tier: workers probe the hive layout instead of a
    broadcast Gazetteer — identical output (forced-tier e2e test)."""
    if shards_dir is not None:

        def sfn(batch: pa.Table, _dir=shards_dir, _mc=max(cfg.gazetteer_shards, 64)) -> pa.Table:
            return link_batch(_sharded_for(_dir, _mc), batch)

        return docs.map_batches(
            sfn, batch_format="pyarrow", batch_size=cfg.ner_batch_size
        )

    if cfg.ner_stateless:

        def fn(batch: pa.Table, _ref=entities_ref) -> pa.Table:
            return link_batch(_gazetteer_for(_ref), batch)

        return docs.map_batches(
            fn, batch_format="pyarrow", batch_size=cfg.ner_batch_size
        )

    from ..util import pool_size

    return docs.map_batches(
        MentionLinker,
        fn_constructor_kwargs={"entities_ref": entities_ref},
        batch_format="pyarrow",
        batch_size=cfg.ner_batch_size,
        concurrency=pool_size(cfg.ner_concurrency),
        num_cpus=1,
    )


def triples_projection(mentions_resolved: ray.data.Dataset) -> ray.data.Dataset:
    """MENTIONS_RESOLVED → TRIPLES_LINKED: a pure vectorized Arrow
    filter+rename (no re-extraction)."""

    def project(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["pred"]))
        return pa.Table.from_arrays(
            [
                t["url"],
                t["sent_id"],
                t["key"],
                t["etype"],
                t["resolved"],
                t["pred"],
                pc.cast(t["obj_key"], pa.string()),
                pc.cast(t["obj_type"], pa.string()),
                pc.cast(t["obj_resolved"], pa.bool_()),
            ],
            schema=TRIPLES_LINKED,
        )

    return mentions_resolved.map_batches(project, batch_format="pyarrow")
