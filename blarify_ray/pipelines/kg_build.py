"""End-to-end KG build (SURVEY.md §7.1 stage graph), checkpointed.

pages → [S1 extract+dedup] → docs.parquet
      → [S2–S4 NER+triples+link, actor pool] → mentions_resolved.parquet
      → [S5 canonicalize (LSH + union-find)] → canonical.parquet
      → [S6 entities / edges, partial-agg + groupby] → partitioned parquet

Each stage is a checkpoint: written atomically with a lineage manifest
(state/manifest.py), so a killed run resumes by skipping stages whose
lineage matches — and downstream stages re-read Parquet instead of
holding page-scale intermediates in the object store (the multi-consumer
fan-out of mentions_resolved costs one scan per consumer, not one NER
pass per consumer).
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..corpus import entity_universe
from ..linking import known_alias_norms
from ..rules import Gazetteer
from ..sources.pages import synth_pages
from ..stages.extract import extract_and_dedup
from ..stages.materialize import (
    GRAPH_INPUT_COLUMNS,
    build_graph,
    split_edges,
    split_entities,
)
from ..stages.mentions import detect_and_link, triples_projection
from ..state.manifest import lineage_hash, read_manifest, read_stage, run_stage


def canonical_dir(can_path: str) -> str:
    """Path of the canonical map inside a committed S5 checkpoint — the
    ``canonical/`` parquet directory (1 file from the driver tiers,
    sharded from the distributed tier); falls back to the legacy
    single-file layout for pre-existing caches."""
    d = os.path.join(can_path, "canonical")
    if os.path.isdir(d):
        return d
    return os.path.join(can_path, "canonical.parquet")


def canonical_num_rows(path: str) -> int:
    """Row count from parquet FOOTERS only (no column data is read) —
    the broadcast-vs-copartition tier probe must stay metadata-cheap for
    both the single-file and sharded layouts."""
    if os.path.isdir(path):
        import glob

        return sum(
            pq.read_metadata(f).num_rows
            for f in glob.glob(os.path.join(path, "*.parquet"))
        )
    return pq.read_metadata(path).num_rows


def tee_batch(t: pa.Table, out_dir: str) -> pa.Table:
    """Side-output one batch of the fused S1+S2 stream into the docs
    checkpoint with a DETERMINISTIC per-batch filename: urls are unique
    across the deduped docs stream, so (first url, last url, row count)
    identifies the batch — a Ray task RETRY re-executes the same batch
    and OVERWRITES its part instead of appending a duplicate (uuid names
    silently duplicated doc rows in the committed checkpoint)."""
    import hashlib

    if t.num_rows == 0:
        return t
    urls = t["url"]
    h = hashlib.md5()
    h.update(str(urls[0]).encode())
    h.update(str(urls[-1]).encode())
    h.update(str(t.num_rows).encode())
    pq.write_table(t, os.path.join(out_dir, f"part-{h.hexdigest()}.parquet"))
    return t


def build_kg(
    out_dir: str,
    n_pages: int,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    pages: ray.data.Dataset | None = None,
    source_fingerprint: str | None = None,
    _upstream_lineages: dict[str, str] | None = None,
    **_ignored,
) -> dict[str, str]:
    """Run (or resume) the full pipeline; returns stage paths.

    ``_upstream_lineages`` lets the incremental path inject the lineage
    values it already wrote for docs/mentions so those stages are
    recognized as current and only the aggregates recompute."""
    os.makedirs(out_dir, exist_ok=True)
    entities = entity_universe(n_pages)
    gaz_fp = lineage_hash("gazetteer", len(entities))
    src_fp = source_fingerprint or lineage_hash("synth", n_pages, cfg.max_html_bytes)
    up = _upstream_lineages or {}

    # S1 + S2–S4. When BOTH stages are stale they run FUSED: one
    # streaming execution extracts docs, tees each batch into the docs
    # checkpoint as a side output, and feeds NER directly — the corpus
    # text never round-trips through parquet between the stages, and one
    # execution's fixed latency replaces two. Each stage keeps its own
    # manifest/lineage, so resume semantics are unchanged (a valid docs
    # checkpoint with a stale mentions stage still rebuilds only S2–S4
    # from the checkpoint).
    docs_lin = up.get("docs") or lineage_hash("docs", src_fp, cfg.supported_langs, cfg.max_html_bytes)
    men_lin = up.get("mentions") or lineage_hash("mentions", docs_lin, gaz_fp, cfg.ner_batch_size)

    def _current(stage: str, lin: str) -> bool:
        man = read_manifest(out_dir, stage)
        return man is not None and man.get("lineage") == lin

    # gazetteer tier: broadcast dictionary by default; above
    # gazetteer_broadcast_max the dictionary is hive-SHARDED once per
    # universe (manifest-keyed) and workers probe shards instead of
    # holding a broadcast copy (stages/gazetteer_shards.py)
    shards_dir: str | None = None
    if len(entities) > cfg.gazetteer_broadcast_max:
        from ..stages.gazetteer_shards import build_gazetteer_shards

        def produce_shards(tmp: str) -> None:
            build_gazetteer_shards(entities, tmp, n_shards=cfg.gazetteer_shards)

        shards_path, _ = run_stage(
            out_dir, "gaz_shards",
            lineage_hash("gaz_shards", gaz_fp, cfg.gazetteer_shards),
            produce_shards,
        )
        shards_dir = shards_path

    if _current("docs", docs_lin):
        docs_path = os.path.join(out_dir, "docs")

        def produce_mentions(tmp: str) -> None:
            ents_ref = ray.put(entities) if shards_dir is None else None
            docs = read_stage(docs_path, columns=["url", "text", "raw", "lang"])
            detect_and_link(docs, ents_ref, cfg, shards_dir=shards_dir).write_parquet(tmp)

        men_path, _ = run_stage(out_dir, "mentions", men_lin, produce_mentions)
    else:
        from ..state.manifest import run_fused_stages

        def produce_docs_and_mentions(docs_tmp: str, men_tmp: str) -> None:
            ds = pages if pages is not None else synth_pages(n_pages, cfg)

            def tee(t: pa.Table, _dir=docs_tmp) -> pa.Table:
                return tee_batch(t, _dir)

            docs_ds = extract_and_dedup(ds, cfg).map_batches(
                tee, batch_format="pyarrow", batch_size=8192
            )
            ents_ref = ray.put(entities) if shards_dir is None else None
            detect_and_link(docs_ds, ents_ref, cfg, shards_dir=shards_dir).write_parquet(men_tmp)

        docs_path, men_path = run_fused_stages(
            out_dir, ("docs", docs_lin), ("mentions", men_lin), produce_docs_and_mentions
        )

    # S5 — canonical map (entity-scale, single parquet file)
    can_lin = lineage_hash(
        "canonical", men_lin, gaz_fp, cfg.minhash_perms, cfg.lsh_bands,
        cfg.shingle_k, cfg.jaccard_threshold, cfg.cc_max_rounds,
        cfg.resolver_mode.value, cfg.embed_link_threshold,
    )

    def produce_canonical(tmp: str) -> None:
        from ..stages.canonicalize import write_canonical_map

        known = known_alias_norms(Gazetteer(entities))
        mr = read_stage(men_path, columns=["key", "resolved"])
        # writes a parquet DIRECTORY: one file from the gated driver
        # tiers, sharded files from the fully distributed tier (which
        # never assembles a norm-scale table on the driver)
        write_canonical_map(mr, known, cfg, os.path.join(tmp, "canonical"))

    can_path, _ = run_stage(out_dir, "canonical", can_lin, produce_canonical)

    canon_file = canonical_dir(can_path)
    # the canonical map is broadcast as a driver dict only while it fits
    # (canon_broadcast_max); above that it stays a sharded TABLE and the
    # S6 resolve becomes a hash-co-partitioned lookup join — the map
    # never materializes on one machine (open-vocabulary path).
    canon: dict | None = None
    if canonical_num_rows(canon_file) <= cfg.canon_broadcast_max:
        canon_tbl = pq.read_table(canon_file)
        canon = {
            n: (nm, t, bool(new))
            for n, nm, t, new in zip(
                canon_tbl["norm"].to_pylist(), canon_tbl["name"].to_pylist(),
                canon_tbl["etype"].to_pylist(), canon_tbl["is_new"].to_pylist(),
            )
        }

    # S6 — entities + edges, FUSED: one corpus-scale scan of
    # mentions_resolved feeds both aggregations through a single
    # kind-tagged groupby exchange; the merged output is entity-scale and
    # is materialized once, then split into the two sorted stage layouts.
    # (Halves the per-build scan+shuffle count — per-stage orchestration
    # latency was the measured scaling-efficiency bottleneck.)
    ent_lin = lineage_hash("entities", men_lin, can_lin, cfg.num_buckets, cfg.env.prefix)
    edge_lin = lineage_hash("edges", men_lin, can_lin, cfg.num_buckets, cfg.env.prefix)

    def _stale(stage: str, lin: str) -> bool:
        man = read_manifest(out_dir, stage)
        return man is None or man.get("lineage") != lin

    graph = None
    if _stale("entities", ent_lin) or _stale("edges", edge_lin):
        import time

        from ..state.manifest import _append_metrics

        t0 = time.monotonic()
        mr = read_stage(men_path, columns=GRAPH_INPUT_COLUMNS)
        if canon is None:  # sharded-map path: co-partitioned resolve
            from ..stages.materialize import resolve_via_copartition

            canon_ds = ray.data.read_parquet(canon_file, columns=["norm", "name", "etype"])
            mr = resolve_via_copartition(mr, canon_ds, cfg.agg_partitions)
            canon_ref = ray.put({})
        else:
            canon_ref = ray.put(canon)
        from ..util import hash_shuffle_scope

        with hash_shuffle_scope():
            graph = build_graph(mr, canon_ref, cfg).materialize()
        _append_metrics(
            out_dir,
            {"stage": "graph_fused", "lineage": ent_lin,
             "rows": graph.count(), "wall_s": round(time.monotonic() - t0, 3)},
        )

    from ..util import hash_shuffle_scope as _hss

    def _bucket_sorted(ds: ray.data.Dataset, sort_cols: list[str]) -> ray.data.Dataset:
        # Within-bucket total order is the layout contract (point reads
        # prune by bucket). A hash exchange on `bucket` + one in-memory
        # sort per bucket group replaces the global sample-sort — no
        # global range partitioning step, and each bucket lands in one
        # block so the hive-partitioned write emits one sorted file per
        # bucket.
        def srt(g: pa.Table) -> pa.Table:
            return g.sort_by([(c, "ascending") for c in sort_cols])

        return ds.groupby("bucket").map_groups(srt, batch_format="pyarrow")

    def produce_entities(tmp: str) -> None:
        with _hss():
            _bucket_sorted(split_entities(graph), ["entity_id"]).write_parquet(
                tmp, partition_cols=["bucket"]
            )

    def produce_edges(tmp: str) -> None:
        with _hss():
            _bucket_sorted(
                split_edges(graph), ["src_id", "pred", "dst_id"]
            ).write_parquet(tmp, partition_cols=["bucket"])

    # NOTE: running these two executions concurrently from threads was
    # tried and reverted — it saved ~2 s of build wall but left Ray's
    # scheduler state polluted for the rest of the session (every later
    # query in the same process ran ~3× slower). Dataset executions
    # belong on the main thread.
    ent_path, _ = run_stage(out_dir, "entities", ent_lin, produce_entities)
    edge_path, _ = run_stage(out_dir, "edges", edge_lin, produce_edges)

    # dst-bucketed copy of the edge table — the INBOUND index (the
    # reference DB indexes both relationship directions): point lookups
    # prune inbound edges to one bucket dir instead of scanning the full
    # table. ZERO-SHUFFLE derivation: one streaming map pass rebuckets +
    # sorts each batch and the hive-partitioned write splits it per
    # bucket dir (a bucket may hold several files — point reads scan all
    # files of ONE dir, so pruning is unaffected, and skipping the
    # groupby exchange keeps this stage safe under the driver's default
    # DataContext, where a hash-shuffle aggregator pool can livelock the
    # streaming executor). Lineage chains off edge_lin so the index
    # rebuilds exactly when the edges do.
    dst_lin = lineage_hash("edges_by_dst", edge_lin)

    def produce_edges_by_dst(tmp: str) -> None:
        import numpy as np

        from ..ids import id_bucket_array

        def rebucket(t: pa.Table) -> pa.Table:
            b = id_bucket_array(
                np.asarray(t["dst_id"].to_pylist(), dtype=object), cfg.num_buckets
            )
            t = t.set_column(
                t.schema.get_field_index("bucket"), "bucket", pa.array(b, pa.int32())
            )
            return t.sort_by(
                [("dst_id", "ascending"), ("pred", "ascending"), ("src_id", "ascending")]
            )

        read_stage(edge_path).map_batches(
            rebucket, batch_format="pyarrow"
        ).write_parquet(tmp, partition_cols=["bucket"])

    dstidx_path, _ = run_stage(out_dir, "edges_by_dst", dst_lin, produce_edges_by_dst)

    return {
        "docs": docs_path,
        "mentions": men_path,
        "canonical": can_path,
        "entities": ent_path,
        "edges": edge_path,
        "edges_by_dst": dstidx_path,
    }


def triples_table(paths: dict[str, str], cfg: PipelineConfig = DEFAULT_CONFIG) -> ray.data.Dataset:
    """Canonicalized (url, sent_id, subj, pred, obj) triples — the P/R
    comparison surface vs the serial golden (FIXTURES.md §3)."""
    canon_tbl = pq.read_table(canonical_dir(paths["canonical"]))
    canon = {
        n: (nm, t, bool(new))
        for n, nm, t, new in zip(
            canon_tbl["norm"].to_pylist(), canon_tbl["name"].to_pylist(),
            canon_tbl["etype"].to_pylist(), canon_tbl["is_new"].to_pylist(),
        )
    }
    canon_ref = ray.put(canon)

    def resolve(batch: pa.Table) -> pa.Table:
        import numpy as np

        from ..util import get_broadcast

        c = get_broadcast(canon_ref)

        def res(keys, types, resolveds):
            # vectorized: canonical lookup per DISTINCT key (entity-scale
            # per batch), then a factorized gather — never per-row Python
            kn = np.asarray(keys.to_pylist(), dtype=object)
            tn = np.asarray(types.to_pylist(), dtype=object)
            rn = np.asarray(resolveds.to_pylist(), dtype=bool)
            import pandas as pd

            codes, uniq = pd.factorize(kn)
            mapped = np.array(
                [c.get(u, (u, "UNK", True))[:2] for u in uniq], dtype=object
            ).reshape(len(uniq), 2) if len(uniq) else np.empty((0, 2), object)
            names = np.where(rn, kn, mapped[codes, 0] if len(uniq) else kn)
            typs = np.where(rn, tn, mapped[codes, 1] if len(uniq) else tn)
            return names.tolist(), typs.tolist()

        sn, st = res(batch["subj_key"], batch["subj_type"], batch["subj_resolved"])
        on, ot = res(batch["obj_key"], batch["obj_type"], batch["obj_resolved"])
        return pa.Table.from_pydict(
            {
                "url": batch["url"],
                "sent_id": batch["sent_id"],
                "subj": pa.array(sn, pa.string()),
                "subj_type": pa.array(st, pa.string()),
                "pred": batch["pred"],
                "obj": pa.array(on, pa.string()),
                "obj_type": pa.array(ot, pa.string()),
            }
        )

    mr = read_stage(
        paths["mentions"],
        columns=[
            "url", "sent_id", "key", "etype", "resolved",
            "pred", "obj_key", "obj_type", "obj_resolved",
        ],
    )
    return triples_projection(mr).map_batches(resolve, batch_format="pyarrow")
