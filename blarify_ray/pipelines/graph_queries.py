"""Query layer over the materialized KG parquet tables — parity with the
reference's read-side capabilities (SURVEY.md §2.7, all from
``blarify/repositories/graph_db_manager/queries.py``):

- node detail + inbound/outbound edges with partition pruning
  (``queries.py:99-210,2359-2427``)
- find-by-name / grep scans (``queries.py:2429-2456,1746-1849``)
- k-hop traversal by iterative frontier semi-joins — the DFS workflow
  expansion shape (``queries.py:926-1053,1293-1422``), depth-capped
- entry-point discovery: nodes with no incoming edges — anti-join
  aggregate (``queries.py:1692-1701``)
- top entities by mention count / edge degree (per-file top-5 analog,
  ``project_graph_creator.py:206-237``)
- skeleton: per-predicate × type adjacency rollup (codebase-skeleton
  render analog, ``queries.py:18-118``)

All operate over the ``entities`` / ``edges`` stage directories written
by ``kg_build``; point lookups prune to the single ``bucket=`` hash
partition that can hold the id.
"""

from __future__ import annotations

import os

import functools

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..ids import id_bucket
from ..state.manifest import read_stage


def _bucket_files(stage_path: str, bucket: int) -> list[str]:
    d = os.path.join(stage_path, f"bucket={bucket}")
    if not os.path.isdir(d):
        return []
    return [os.path.join(d, f) for f in sorted(os.listdir(d)) if f.endswith(".parquet")]


@functools.lru_cache(maxsize=1 << 16)
def _rel_bucket(etype: str, key: str, num_buckets: int) -> int:
    """Bucket of the ENV-INDEPENDENT relative id (md5 of ``type/name``)
    — memoized per distinct (etype, key), i.e. vocabulary-scale.
    Module-level so Ray map fns that close over it stay picklable."""
    from .graph_diff import relative_entity_id

    return id_bucket(relative_entity_id(etype, key), num_buckets)


def ensure_mentions_by_entity(
    paths: dict[str, str], cfg: PipelineConfig = DEFAULT_CONFIG
) -> str:
    """Entity-bucketed hive index of RESOLVED mentions — the
    ``edges_by_dst`` pattern applied to the mentions table: one
    ZERO-SHUFFLE streaming pass buckets each resolved mention by the
    md5-id of its canonical (etype, key), and the hive write splits per
    bucket dir, so per-entity point lookups (blame, mention lists) read
    ONE bucket instead of scanning the corpus-scale table.

    Built LAZILY on first use (not in ``build_kg`` — point indexes
    shouldn't tax the build path) and manifest-tracked: lineage chains
    off the mentions stage manifest, so it rebuilds exactly when the
    mentions do.

    Buckets derive from the ENV-INDEPENDENT relative id (md5 of
    ``type/name``, ``relative_id_calculator.py`` analog) — the mention
    rows carry no environment, so coupling the bucket to ``cfg.env``
    would silently empty every lookup against a KG built under a
    non-default ``GraphEnvironment``."""
    from ..state.manifest import lineage_hash, read_manifest, run_stage

    out_dir = os.path.dirname(paths["mentions"].rstrip(os.sep))
    men_man = read_manifest(out_dir, "mentions") or {}
    lin = lineage_hash(
        "mentions_by_entity", men_man.get("lineage", "none"),
        cfg.num_buckets, "relative-v2",
    )
    nb = cfg.num_buckets

    def produce(tmp: str) -> None:
        def rebucket(t: pa.Table) -> pa.Table:
            t = t.filter(t["resolved"])
            # memoized md5 per distinct (etype, key) — vocabulary-scale
            b = [
                _rel_bucket(et, k, nb)
                for et, k in zip(t["etype"].to_pylist(), t["key"].to_pylist())
            ]
            t = t.append_column("bucket", pa.array(b, pa.int32()))
            return t.sort_by(
                [("key", "ascending"), ("url", "ascending"), ("sent_id", "ascending")]
            )

        read_stage(
            paths["mentions"],
            columns=["url", "sent_id", "surface", "key", "etype", "resolved"],
        ).map_batches(rebucket, batch_format="pyarrow").write_parquet(
            tmp, partition_cols=["bucket"]
        )

    path, _ = run_stage(out_dir, "mentions_by_entity", lin, produce)
    return path


def entity_mentions(
    paths: dict[str, str], eid: str, limit: int = 100,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> list[dict]:
    """Usage sites of an entity — every resolved mention occurrence
    ``(url, sent_id, surface)``, ordered — the find-references surface
    (``queries.py`` reference-listing analog). Point lookup: a
    one-bucket entity-row read, then ONE bucket dir of the
    ``mentions_by_entity`` index (keyed by the env-independent relative
    id) — never a full node_detail (whose inbound-edge fallback can be
    a corpus-scale scan)."""
    ent = entity_row(paths, eid, cfg)
    if ent is None:
        return []
    idx_dir = ensure_mentions_by_entity(paths, cfg)
    b = _rel_bucket(ent["type"], ent["name"], cfg.num_buckets)
    rows: list[dict] = []
    for f in _bucket_files(idx_dir, b):
        t = pq.read_table(f, columns=["url", "sent_id", "surface", "key", "etype"])
        m = t.filter(
            pc.and_(pc.equal(t["key"], ent["name"]), pc.equal(t["etype"], ent["type"]))
        )
        rows.extend(
            {"url": u, "sent_id": int(s), "surface": sf}
            for u, s, sf in zip(
                m["url"].to_pylist(), m["sent_id"].to_pylist(), m["surface"].to_pylist()
            )
        )
    rows.sort(key=lambda r: (r["url"], r["sent_id"], r["surface"]))
    return rows[:limit]


def entity_row(
    paths: dict[str, str], eid: str, cfg: PipelineConfig = DEFAULT_CONFIG
) -> dict | None:
    """One-bucket point read of a single entity row (no edges) — the
    cheap lookup for callers that only need name/type (mention lists,
    blame attribution)."""
    b = id_bucket(eid, cfg.num_buckets)
    for f in _bucket_files(paths["entities"], b):
        t = pq.read_table(f)
        m = t.filter(pc.equal(t["entity_id"], eid))
        if m.num_rows:
            return m.to_pylist()[0]
    return None


def node_detail(
    paths: dict[str, str], eid: str, cfg: PipelineConfig = DEFAULT_CONFIG
) -> dict:
    """Point lookup with hash-partition pruning: read ONE bucket dir for
    the entity row; outbound edges from the src-bucketed layout, inbound
    from the dst-bucketed index (``edges_by_dst``) when the build wrote
    one — BOTH directions are then one-bucket reads, never a full-table
    scan. Falls back to a filtered scan for pre-index builds."""
    b = id_bucket(eid, cfg.num_buckets)
    ent = entity_row(paths, eid, cfg)
    if ent is None:
        return {"entity": None, "outbound": [], "inbound": []}
    out = []
    for f in _bucket_files(paths["edges"], b):
        t = pq.read_table(f)
        out.extend(t.filter(pc.equal(t["src_id"], eid)).to_pylist())
    dst_idx = paths.get("edges_by_dst")
    if dst_idx and os.path.isdir(dst_idx):
        inbound = []
        for f in _bucket_files(dst_idx, b):
            t = pq.read_table(f)
            rows = t.filter(pc.equal(t["dst_id"], eid)).to_pylist()
            for r in rows:
                # the index carries the DST bucket; restore the canonical
                # (src) bucket so rows are byte-equal to the edges table
                r["bucket"] = id_bucket(r["src_id"], cfg.num_buckets)
            inbound.extend(rows)
        inbound.sort(key=lambda r: (r["src_id"], r["pred"]))
    else:
        inbound = (
            read_stage(paths["edges"])
            .map_batches(
                lambda t: t.filter(pc.equal(t["dst_id"], eid)), batch_format="pyarrow"
            )
            .take_all()
        )
    return {"entity": ent, "outbound": out, "inbound": inbound}


def find_entities(paths: dict[str, str], name_substring: str) -> ray.data.Dataset:
    """Grep over entity names/aliases (vectorized substring match)."""

    def grep(t: pa.Table) -> pa.Table:
        name_hit = pc.match_substring(t["name"], name_substring)
        alias_hit = pa.array(
            [any(name_substring in a for a in row) for row in t["aliases"].to_pylist()]
        )
        return t.filter(pc.or_(name_hit, alias_hit))

    return read_stage(paths["entities"]).map_batches(grep, batch_format="pyarrow")


def k_hop(
    paths: dict[str, str],
    seed_ids: list[str],
    max_depth: int = 3,
    preds: list[str] | None = None,
    offset: int = 0,
    limit: int | None = None,
    direction: str = "out",
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> ray.data.Dataset:
    """Iterative frontier expansion over the edges table — the Ray shape
    of the reference's bounded DFS (maxDepth, NODE_PATH uniqueness).
    Returns ds[(entity_id, depth)] with minimal depth.

    Frontier tier, decided PER ROUND (hub-node safety): while the
    frontier + seen sets fit under ``cfg.khop_broadcast_max`` the round
    is a broadcast semi-join (sorted id array + ``pc.is_in``); the first
    round whose candidate count overflows converts the state to
    hash-partitioned ``(id, depth)`` datasets and every later round is a
    co-partitioned semi-join + distributed anti-join — the frontier
    never has to fit on the driver again. Both tiers produce identical
    rows (forced-tier tested).

    ``direction``: "out" follows edges src→dst (default), "in" follows
    them dst→src (who references me, transitively), "both" treats the
    graph as undirected — implemented by one map-only edge transform,
    so every tier/paging path is shared."""
    edges = read_stage(paths["edges"], columns=["src_id", "dst_id", "pred"])
    if direction == "in":
        edges = edges.map_batches(
            lambda t: pa.Table.from_pydict(
                {"src_id": t["dst_id"], "dst_id": t["src_id"], "pred": t["pred"]}
            ),
            batch_format="pyarrow",
        )
    elif direction == "both":
        edges = edges.map_batches(
            lambda t: pa.Table.from_pydict(
                {
                    "src_id": pa.concat_arrays(
                        [t["src_id"].combine_chunks(), t["dst_id"].combine_chunks()]
                    ),
                    "dst_id": pa.concat_arrays(
                        [t["dst_id"].combine_chunks(), t["src_id"].combine_chunks()]
                    ),
                    "pred": pa.concat_arrays(
                        [t["pred"].combine_chunks(), t["pred"].combine_chunks()]
                    ),
                }
            ),
            batch_format="pyarrow",
        )
    elif direction != "out":
        raise ValueError(f"direction must be out|in|both, got {direction!r}")
    if preds is not None:
        pred_arr = pa.array(sorted(set(preds)), pa.string())
        edges = edges.map_batches(
            lambda t: t.filter(pc.is_in(t["pred"], value_set=pred_arr)),
            batch_format="pyarrow",
        )
    edges = edges.materialize()
    seen: dict[str, int] = {s: 0 for s in seed_ids}
    frontier = set(seed_ids)
    depth = 0
    overflow = len(frontier) > cfg.khop_broadcast_max
    while depth < max_depth and frontier and not overflow:
        depth += 1
        fr_arr = pa.array(sorted(frontier), pa.string())  # once per round

        def step(t: pa.Table, _fr=fr_arr) -> pa.Table:
            t = t.filter(pc.is_in(t["src_id"], value_set=_fr))
            return pa.Table.from_pydict({"dst_id": pc.unique(t["dst_id"])})

        cand = edges.map_batches(step, batch_format="pyarrow")
        if cand.count() > cfg.khop_broadcast_max:
            # a hub blew the broadcast budget mid-round: redo THIS round
            # distributed (the per-batch-unique count is a conservative
            # overestimate of the distinct frontier, which is the safe
            # direction for a driver-memory guard)
            depth -= 1
            overflow = True
            break
        nxt = {r["dst_id"] for r in cand.take_all()}
        frontier = {n for n in nxt if n not in seen}
        for n in frontier:
            seen[n] = depth
    if overflow and depth < max_depth and frontier:
        return _k_hop_distributed(
            edges, seen, frontier, depth, max_depth, offset, limit, cfg
        )
    rows = sorted(seen.items(), key=lambda kv: (kv[1], kv[0]))  # (depth, id)
    if offset or limit is not None:
        # skip/limit batching over the deterministic ordering, matching
        # the reference's paged traversal queries (queries.py:1293-1422):
        # paged calls concatenate exactly to the unpaged result
        rows = rows[offset : (offset + limit) if limit is not None else None]
    tbl = pa.Table.from_pydict(
        {
            "entity_id": pa.array([k for k, _ in rows], pa.string()),
            "depth": pa.array([d for _, d in rows], pa.int32()),
        }
    )
    return ray.data.from_arrow(tbl)


def _k_hop_distributed(
    edges: ray.data.Dataset,
    seen: dict[str, int],
    frontier: set[str],
    depth: int,
    max_depth: int,
    offset: int,
    limit: int | None,
    cfg: PipelineConfig,
) -> ray.data.Dataset:
    """Dataset-tier continuation of ``k_hop``: state moves into
    hash-partitioned ``(entity_id, depth)`` datasets (``seen`` at switch
    time is bounded by the broadcast threshold, so the one-time driver →
    dataset conversion is cheap). Each round is (1) one co-partitioned
    inner semi-join of the edge table against the frontier ids
    (``copartition_attach`` — no ``Dataset.join``, no broadcast), (2)
    per-batch distinct on the expansion, (3) one hash-routed distributed
    anti-join against ``seen`` that emits the new frontier with its
    depth. Paging reads only ``offset + limit`` rows to the driver."""
    import numpy as np
    import pandas as pd

    from ..ops.joins import copartition_attach
    from ..util import compact_nonempty

    parts = max(1, min(cfg.agg_partitions, edges.count() // cfg.cc_rows_per_partition + 1))

    def as_ds(d: dict[str, int]) -> ray.data.Dataset:
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "entity_id": pa.array(sorted(d), pa.string()),
                    "depth": pa.array([d[k] for k in sorted(d)], pa.int32()),
                }
            )
        )

    seen_ds = as_ds(seen)
    frontier_ds = as_ds({f: depth for f in frontier})

    def tag(is_seen: int, d: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            if "depth" not in df.columns:
                df["depth"] = np.int32(d)
            df["_seen"] = np.int8(is_seen)
            df["_pkey"] = (
                pd.util.hash_array(df["entity_id"].to_numpy(dtype=object)) % parts
            ).astype("int32")
            return df

        return f

    while depth < max_depth:
        depth += 1
        # edges as LEFT, frontier as the unique lookup side (the attach
        # contract requires the RIGHT side unique per key)
        hits = copartition_attach(
            edges, frontier_ds, "src_id", "entity_id", {"depth": "_d"},
            partitions=parts, how="inner",
        )
        cand = compact_nonempty(
            hits.map_batches(
                lambda t: pa.Table.from_pydict({"entity_id": pc.unique(t["dst_id"])}),
                batch_format="pyarrow",
            )
        )

        def merge(g: pd.DataFrame, _d=depth) -> pd.DataFrame:
            seen_ids = g.loc[g["_seen"] == 1, "entity_id"]
            c = g.loc[g["_seen"] == 0, "entity_id"].drop_duplicates()
            new = c[~c.isin(set(seen_ids))]
            return pd.DataFrame(
                {
                    "entity_id": new.to_numpy(dtype=object),
                    "depth": np.full(len(new), _d, dtype="int32"),
                }
            )

        new_ds = compact_nonempty(
            cand.map_batches(tag(0, depth), batch_format="pandas")
            .union(seen_ds.map_batches(tag(1, 0), batch_format="pandas"))
            .groupby("_pkey")
            .map_groups(merge, batch_format="pandas")
        )
        if new_ds.count() == 0:
            break
        seen_ds = compact_nonempty(seen_ds.union(new_ds))
        frontier_ds = new_ds

    out = seen_ds.sort(["depth", "entity_id"])
    if offset or limit is not None:
        # the page (offset + limit rows) is the ONLY driver
        # materialization — unit paging over the same deterministic
        # (depth, entity_id) ordering as the broadcast tier
        end = (offset + limit) if limit is not None else None
        rows = out.take_all() if end is None else out.limit(end).take_all()
        rows = rows[offset:end]
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "entity_id": pa.array([r["entity_id"] for r in rows], pa.string()),
                    "depth": pa.array([r["depth"] for r in rows], pa.int32()),
                }
            )
        )
    return out


def entry_points(paths: dict[str, str], partitions: int = 64) -> ray.data.Dataset:
    """Entities with outgoing edges but NO incoming edges — a fully
    distributed anti-join: every edge contributes (id, is_src) count
    rows, pre-aggregated per batch, hash-routed by id into
    ``partitions`` Ray-level groups, and resolved with one vectorized
    pandas pivot per group. No driver-side id set — the node set never
    leaves the workers (scale-safe for open-vocabulary graphs)."""
    import pandas as pd

    edges = read_stage(paths["edges"], columns=["src_id", "dst_id"])

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        s = pd.concat(
            [
                pd.DataFrame({"id": df["src_id"], "is_src": 1}),
                pd.DataFrame({"id": df["dst_id"], "is_src": 0}),
            ],
            ignore_index=True,
        )
        g = s.groupby(["id", "is_src"], sort=True).size().reset_index(name="n")
        g["_pkey"] = (
            pd.util.hash_array(g["id"].to_numpy(dtype=object)) % partitions
        ).astype("int32")
        return g

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        p = g.groupby(["id", "is_src"])["n"].sum().unstack(fill_value=0)
        n_out = p[1] if 1 in p.columns else pd.Series(0, index=p.index)
        n_in = p[0] if 0 in p.columns else pd.Series(0, index=p.index)
        keep = p.index[(n_out > 0) & (n_in == 0)]
        out = pd.DataFrame({"src_id": keep.astype(str), "n_out": n_out.loc[keep].astype("int64")})
        return out.reset_index(drop=True)

    return (
        edges.map_batches(partial, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(merge, batch_format="pandas")
    )


def top_entities(paths: dict[str, str], k: int = 20) -> ray.data.Dataset:
    """Top-k entities by mention count (tie → entity_id)."""
    return (
        read_stage(paths["entities"], columns=["entity_id", "name", "type", "n_mentions"])
        .sort(["n_mentions", "entity_id"], descending=[True, False])
        .limit(k)
    )


def doc_context(paths: dict[str, str], url: str) -> dict:
    """File-context analog (``queries.py`` file context / node info): the
    doc row for a url plus its mentions and triples — a predicate scan
    with column pruning, no full materialization."""

    def only_url(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t["url"], url))

    doc = (
        read_stage(paths["docs"], columns=["url", "warc_ts", "lang", "n_sents", "text"])
        .map_batches(only_url, batch_format="pyarrow")
        .take_all()
    )
    mentions = (
        read_stage(
            paths["mentions"],
            columns=["url", "sent_id", "start", "end", "surface", "ner_type", "key", "resolved", "pred", "obj_key"],
        )
        .map_batches(only_url, batch_format="pyarrow")
        .take_all()
    )
    return {
        "doc": doc[0] if doc else None,
        "mentions": sorted(mentions, key=lambda m: (m["sent_id"], m["start"])),
        "triples": [m for m in mentions if m["pred"] is not None],
    }


def workflows(
    paths: dict[str, str],
    max_depth: int = 6,
    max_paths_per_entry: int = 50,
    preds: list[str] | None = None,
    offset: int = 0,
    limit: int | None = None,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> ray.data.Dataset:
    """DFS execution traces from entry points — the workflow-discovery
    analog (``blarify/documentation/workflow_creator.py:27-135``,
    ``queries.py:926-1053,1293-1422``): depth-capped DFS with NODE_PATH
    uniqueness, edges ordered by (pred, dst_id) (the reference orders by
    (startLine, referenceCharacter), ``queries.py:1329-1334``), and
    longest-common-prefix dedup between consecutive paths — a step
    already emitted under the same prefix is not re-emitted
    (``queries.py:1340-1374``).

    ``offset``/``limit`` page over whole (entry_id, path_id) units in
    the deterministic global ordering — the reference's skip/limit
    batching on traversal queries (``queries.py:1293-1422``). LCP dedup
    is computed on the FULL ordering before paging, so concatenating
    consecutive pages reproduces the unpaged rows exactly.

    Size-tiered: up to ``cfg.workflows_driver_max_edges`` edges the
    adjacency lives on the driver and the recursive DFS runs in-process;
    above it ``_workflows_distributed`` runs the iterative
    frontier-join DFS (path-row datasets, one co-partitioned adjacency
    join per hop, exact per-entry lexicographic top-k pruning per round)
    — no ``take_all`` of the edge table. Both tiers produce identical
    rows (forced-tier tested).

    Returns ds[(entry_id, path_id, step, src_id, pred, dst_id)].
    """
    edges_ds = read_stage(paths["edges"], columns=["src_id", "dst_id", "pred"])
    if edges_ds.count() > cfg.workflows_driver_max_edges:
        return _workflows_distributed(
            edges_ds, max_depth, max_paths_per_entry, preds, offset, limit, cfg
        )
    edges = edges_ds.take_all()
    adj: dict[str, list[tuple[str, str]]] = {}
    dsts = set()
    for e in edges:
        if preds is not None and e["pred"] not in preds:
            continue
        adj.setdefault(e["src_id"], []).append((e["pred"], e["dst_id"]))
        dsts.add(e["dst_id"])
    for k in adj:
        adj[k].sort()
    entries = sorted(s for s in adj if s not in dsts)

    out = {"entry_id": [], "path_id": [], "step": [], "src_id": [], "pred": [], "dst_id": []}

    for entry in entries:
        paths_found: list[list[tuple[str, str, str]]] = []

        def dfs(node: str, trail: list[tuple[str, str, str]], on_path: set[str]):
            if len(paths_found) >= max_paths_per_entry:
                return
            succ = [
                (p, d) for p, d in adj.get(node, []) if d not in on_path
            ] if len(trail) < max_depth else []
            if not succ:
                if trail:
                    paths_found.append(list(trail))
                return
            for p, d in succ:
                trail.append((node, p, d))
                on_path.add(d)
                dfs(d, trail, on_path)
                on_path.discard(d)
                trail.pop()

        dfs(entry, [], {entry})

        prev: list[tuple[str, str, str]] = []
        for pid, trail in enumerate(paths_found):
            lcp = 0
            while lcp < len(trail) and lcp < len(prev) and trail[lcp] == prev[lcp]:
                lcp += 1
            for step in range(lcp, len(trail)):
                s, p, d = trail[step]
                out["entry_id"].append(entry)
                out["path_id"].append(pid)
                out["step"].append(step)
                out["src_id"].append(s)
                out["pred"].append(p)
                out["dst_id"].append(d)
            prev = trail

    if offset or limit is not None:
        # page over whole (entry_id, path_id) units AFTER LCP dedup
        unit_ids: list[tuple[str, int]] = []
        for e, p in zip(out["entry_id"], out["path_id"]):
            if not unit_ids or unit_ids[-1] != (e, p):
                unit_ids.append((e, p))
        end = (offset + limit) if limit is not None else len(unit_ids)
        keep = set(unit_ids[offset:end])
        mask = [(e, p) in keep for e, p in zip(out["entry_id"], out["path_id"])]
        out = {k: [v for v, m in zip(vals, mask) if m] for k, vals in out.items()}

    tbl = pa.Table.from_pydict(
        {
            "entry_id": pa.array(out["entry_id"], pa.string()),
            "path_id": pa.array(out["path_id"], pa.int32()),
            "step": pa.array(out["step"], pa.int32()),
            "src_id": pa.array(out["src_id"], pa.string()),
            "pred": pa.array(out["pred"], pa.string()),
            "dst_id": pa.array(out["dst_id"], pa.string()),
        }
    )
    return ray.data.from_arrow(tbl)


# Trail encoding for the distributed DFS: steps are "pred\x1fdst" joined
# by "\x1e". Both separators sort below every printable character, so
# PLAIN STRING comparison of two encoded trails equals tuple comparison
# of their step sequences — which, because diverging paths share the
# same current node at the divergence point, is exactly the driver DFS's
# (pred, dst) successor ordering. Step sources are implicit: src of step
# i is dst of step i-1 (the entry for step 0).
_WF_STEP = "\x1e"
_WF_FLD = "\x1f"


def _workflows_distributed(
    edges_ds: ray.data.Dataset,
    max_depth: int,
    max_paths_per_entry: int,
    preds: list[str] | None,
    offset: int,
    limit: int | None,
    cfg: PipelineConfig,
) -> ray.data.Dataset:
    """Iterative frontier-join DFS — the ``k_hop`` shape with path-id
    columns (the reference's batched traversal, ``queries.py:1293-1422``).

    State is a dataset of path rows ``(entry, trail, cur, done)``; each
    round (1) attaches the current node's encoded successor list with ONE
    co-partitioned lookup join against the per-src adjacency table, (2)
    expands every active path by one hop (node-path uniqueness, depth
    cap), and (3) prunes to the lexicographically smallest
    ``max_paths_per_entry`` rows per entry. The prune is EXACT, not a
    heuristic: completed paths are maximal (so never a prefix of another
    row) and active paths all have equal depth, making the per-entry row
    set a prefix-free antichain — every kept row eventually yields ≥1
    completion strictly smaller than any completion of a dropped row, so
    the first k completions always descend from the top-k rows. Per-row
    Python appears only here, where work is per-PATH (≤ k · entries
    rows/round), never per-corpus-row."""
    import pandas as pd

    from ..ops.joins import copartition_attach
    from ..util import compact_nonempty

    if preds is not None:
        pred_arr = pa.array(sorted(set(preds)), pa.string())
        edges_ds = edges_ds.map_batches(
            lambda t: t.filter(pc.is_in(t["pred"], value_set=pred_arr)),
            batch_format="pyarrow",
        )
    edges_ds = compact_nonempty(edges_ds)
    parts = max(1, min(cfg.agg_partitions, edges_ds.count() // cfg.cc_rows_per_partition + 1))

    def _route(col: str):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["_pkey"] = (
                pd.util.hash_array(df[col].to_numpy(dtype=object)) % parts
            ).astype("int32")
            return df

        return f

    # adjacency rows (src, succ): successor list sorted by (pred, dst)
    # and encoded — one hash-route shuffle, vectorized per group
    def adj_rows(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["src_id", "pred", "dst_id"], kind="mergesort")
        enc = g["pred"] + _WF_FLD + g["dst_id"]
        out = enc.groupby(g["src_id"], sort=True).agg(_WF_STEP.join)
        return pd.DataFrame({"src": out.index.to_numpy(), "succ": out.to_numpy()})

    adj = compact_nonempty(
        edges_ds.map_batches(_route("src_id"), batch_format="pandas")
        .groupby("_pkey")
        .map_groups(adj_rows, batch_format="pandas")
    )

    # entries: srcs that never appear as a dst (distributed anti-join,
    # same partial/merge shape as entry_points)
    def ep_partial(df: pd.DataFrame) -> pd.DataFrame:
        s = pd.concat(
            [
                pd.DataFrame({"id": df["src_id"], "is_src": 1}),
                pd.DataFrame({"id": df["dst_id"], "is_src": 0}),
            ],
            ignore_index=True,
        )
        g = s.groupby(["id", "is_src"], sort=True).size().reset_index(name="n")
        g["_pkey"] = (
            pd.util.hash_array(g["id"].to_numpy(dtype=object)) % parts
        ).astype("int32")
        return g

    def ep_merge(g: pd.DataFrame) -> pd.DataFrame:
        p = g.groupby(["id", "is_src"])["n"].sum().unstack(fill_value=0)
        n_out = p[1] if 1 in p.columns else pd.Series(0, index=p.index)
        n_in = p[0] if 0 in p.columns else pd.Series(0, index=p.index)
        keep = p.index[(n_out > 0) & (n_in == 0)]
        return pd.DataFrame(
            {"entry": keep.astype(str), "trail": "", "cur": keep.astype(str), "done": 0}
        ).reset_index(drop=True)

    state = compact_nonempty(
        edges_ds.map_batches(ep_partial, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(ep_merge, batch_format="pandas")
        .map_batches(
            lambda df: df.astype(
                {"entry": str, "trail": str, "cur": str, "done": "int8"}
            ),
            batch_format="pandas",
        )
    )
    if state.count() == 0:
        return ray.data.from_arrow(_wf_empty_table())

    def expand(df: pd.DataFrame) -> pd.DataFrame:
        out = {"entry": [], "trail": [], "cur": [], "done": []}
        for entry, trail, cur, done, succ in zip(
            df["entry"], df["trail"], df["cur"], df["done"], df["succ"]
        ):
            if done:
                out["entry"].append(entry)
                out["trail"].append(trail)
                out["cur"].append(cur)
                out["done"].append(1)
                continue
            steps = trail.split(_WF_STEP) if trail else []
            on_path = {entry} | {s.split(_WF_FLD)[1] for s in steps}
            succs = []
            if len(steps) < max_depth and isinstance(succ, str) and succ:
                succs = [
                    s for s in succ.split(_WF_STEP)
                    if s.split(_WF_FLD)[1] not in on_path
                ]
            if not succs:
                if steps:  # dead end / depth cap → completed path
                    out["entry"].append(entry)
                    out["trail"].append(trail)
                    out["cur"].append(cur)
                    out["done"].append(1)
                continue
            # a trail extended to max_depth is complete by depth cap
            # RIGHT NOW (the driver DFS's `succ = [] if len(trail) ==
            # max_depth` branch) — marking it here instead of waiting
            # for a no-successor round keeps the loop at max_depth
            # rounds total
            depth_capped = len(steps) + 1 >= max_depth
            for s in succs:
                out["entry"].append(entry)
                out["trail"].append(trail + _WF_STEP + s if trail else s)
                out["cur"].append(s.split(_WF_FLD)[1])
                out["done"].append(1 if depth_capped else 0)
        return pd.DataFrame(
            {
                "entry": pd.Series(out["entry"], dtype=str),
                "trail": pd.Series(out["trail"], dtype=str),
                "cur": pd.Series(out["cur"], dtype=str),
                "done": pd.Series(out["done"], dtype="int8"),
            }
        )

    def prune(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["entry", "trail"], kind="mergesort")
        g = g.groupby("entry", sort=False).head(max_paths_per_entry)
        return g[["entry", "trail", "cur", "done"]].reset_index(drop=True)

    for _ in range(max_depth):
        extended = copartition_attach(
            state, adj, "cur", "src", {"succ": "succ"}, partitions=parts, how="left"
        ).map_batches(expand, batch_format="pandas")
        state = compact_nonempty(
            extended.map_batches(_route("entry"), batch_format="pandas")
            .groupby("_pkey")
            .map_groups(prune, batch_format="pandas")
        )
        if state.count() == 0 or state.sum("done") == state.count():
            break

    # finalize per entry: lex order → path_id, LCP dedup vs predecessor,
    # explode steps (per-entry work is ≤ k paths × max_depth steps)
    def finalize(g: pd.DataFrame) -> pd.DataFrame:
        out = {"entry_id": [], "path_id": [], "step": [], "src_id": [], "pred": [], "dst_id": []}
        g = g[(g["done"] == 1) & (g["trail"] != "")]
        for entry, sub in g.groupby("entry", sort=True):
            prev: list[tuple[str, str, str]] = []
            for pid, trail in enumerate(sorted(sub["trail"])):
                steps, src = [], entry
                for s in trail.split(_WF_STEP):
                    p, d = s.split(_WF_FLD)
                    steps.append((src, p, d))
                    src = d
                lcp = 0
                while lcp < len(steps) and lcp < len(prev) and steps[lcp] == prev[lcp]:
                    lcp += 1
                for i in range(lcp, len(steps)):
                    s, p, d = steps[i]
                    out["entry_id"].append(entry)
                    out["path_id"].append(pid)
                    out["step"].append(i)
                    out["src_id"].append(s)
                    out["pred"].append(p)
                    out["dst_id"].append(d)
                prev = steps
        return pd.DataFrame(
            {
                "entry_id": pd.Series(out["entry_id"], dtype=str),
                "path_id": pd.Series(out["path_id"], dtype="int32"),
                "step": pd.Series(out["step"], dtype="int32"),
                "src_id": pd.Series(out["src_id"], dtype=str),
                "pred": pd.Series(out["pred"], dtype=str),
                "dst_id": pd.Series(out["dst_id"], dtype=str),
            }
        )

    rows = compact_nonempty(
        state.map_batches(_route("entry"), batch_format="pandas")
        .groupby("_pkey")
        .map_groups(finalize, batch_format="pandas")
    )
    if rows.count() == 0:
        return ray.data.from_arrow(_wf_empty_table())

    if offset or limit is not None:
        # unit windowing: per-entry path COUNTS (≤ k each, entry-scale
        # metadata — never the paths themselves) come to the driver to
        # compute the global (entry, path_id) window, then a broadcast
        # range filter selects it
        counts = sorted(
            (r["entry_id"], r["n"])
            for r in rows.groupby("entry_id")
            .max("path_id")
            .map_batches(
                lambda t: pa.Table.from_pydict(
                    {"entry_id": t["entry_id"],
                     "n": pc.add(t["max(path_id)"], 1)}
                ),
                batch_format="pyarrow",
            )
            .take_all()
        )
        windows: dict[str, tuple[int, int]] = {}
        pos = 0
        end = (offset + limit) if limit is not None else None
        for eid, n in counts:
            lo = max(0, offset - pos)
            hi = n if end is None else max(0, min(n, end - pos))
            if hi > lo:
                windows[eid] = (lo, hi)
            pos += n
        win_ref = ray.put(windows)

        def window_filter(t: pa.Table) -> pa.Table:
            from ..util import get_broadcast

            w = get_broadcast(win_ref)
            keep = [
                (win := w.get(e)) is not None and win[0] <= p < win[1]
                for e, p in zip(t["entry_id"].to_pylist(), t["path_id"].to_pylist())
            ]
            return t.filter(pa.array(keep, pa.bool_()))

        rows = rows.map_batches(window_filter, batch_format="pyarrow")

    return rows.sort(["entry_id", "path_id", "step"])


def _wf_empty_table() -> pa.Table:
    return pa.Table.from_pydict(
        {
            "entry_id": pa.array([], pa.string()),
            "path_id": pa.array([], pa.int32()),
            "step": pa.array([], pa.int32()),
            "src_id": pa.array([], pa.string()),
            "pred": pa.array([], pa.string()),
            "dst_id": pa.array([], pa.string()),
        }
    )


def render_skeleton_tree(
    paths: dict[str, str],
    max_children: int = 50,
) -> list[str]:
    """Indented tree render of the corpus hierarchy — the reference's
    codebase-skeleton formatter (``queries.py:242-374``:
    ``format_skeleton_as_string`` / ``format_hierarchy_tree``) applied to
    the web-KG's containment hierarchy (root → tld → domain, the
    FOLDER/FILE analog): box-drawing prefixes (``├──``/``└──``/``│``),
    a trailing ``/`` on container nodes, and a ``# TYPE [docs: N]``
    annotation per line.

    The aggregation is the distributed ``bottom_up_rollup``; only its
    domain-scale RESULT reaches the driver for formatting (the
    reference's formatter is likewise a driver-side function over query
    results). ``max_children`` caps fan-out per node deterministically
    (largest ``n_docs`` first, then name), with an elision line — so a
    100-TB corpus with millions of domains still renders."""
    from .hierarchy import bottom_up_rollup

    rows = bottom_up_rollup(paths).take_all()
    if not rows:
        return ["# Corpus Structure", "", "No corpus structure found."]
    max_level = max(r["level"] for r in rows)
    type_of = {max_level: "ROOT"}
    for lv in range(1, max_level):
        type_of[lv] = "TLD" if lv == max_level - 1 else "DOMAIN"

    children: dict[tuple[int, str], list[dict]] = {}
    roots: list[dict] = []
    for r in rows:
        if r["level"] == max_level:
            roots.append(r)
        else:
            parent = r["node"].rsplit(".", 1)[-1] if r["level"] == 1 else "<root>"
            children.setdefault((r["level"] + 1, parent), []).append(r)
    for kids in children.values():
        kids.sort(key=lambda r: (-r["n_docs"], r["node"]))
    roots.sort(key=lambda r: r["node"])

    lines = ["# Corpus Structure", ""]

    def fmt(r: dict, prefix: str, branch: str) -> None:
        kids = children.get((r["level"], r["node"]), [])
        t = type_of[r["level"]]
        slash = "/" if r["level"] > 1 or kids else ""
        lines.append(
            f"{prefix}{branch}{r['node']}{slash}  # {t} [docs: {r['n_docs']}]"
        )
        child_prefix = prefix + ("    " if branch.startswith("└") else "│   ") if branch else ""
        shown = kids[:max_children]
        for i, kid in enumerate(shown):
            last = i == len(shown) - 1 and len(kids) <= max_children
            fmt(kid, child_prefix, "└── " if last else "├── ")
        if len(kids) > max_children:
            lines.append(f"{child_prefix}└── … (+{len(kids) - max_children} more)")

    for root in roots:
        fmt(root, "", "")
    return lines


def render_mermaid(
    paths: dict[str, str],
    seed_id: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    depth: int = 1,
) -> list[str]:
    """Mermaid flowchart lines for a node's neighborhood — the
    graph-rendering formatter (``queries.py:1850-2060`` analog, which is
    1-hop in+out; ``depth`` extends it to the depth-N variant the
    reference's traversal renders build on).

    ``depth=1`` (default): the seed's outbound + inbound edges, exactly
    the reference's mermaid query shape. ``depth>1``: the forward-BFS
    subgraph to ``depth`` hops (edges among visited nodes, discovered by
    the tiered ``k_hop``) plus the seed's inbound edges — the
    neighborhood, not the corpus, is all that reaches the driver."""
    d = node_detail(paths, seed_id, cfg)
    if d["entity"] is None:
        return ["graph TD", f'  missing["{seed_id} (not found)"]']
    extra_edges: list[dict] = []
    if depth > 1:
        visited = {
            r["entity_id"]
            for r in k_hop(paths, [seed_id], max_depth=depth, cfg=cfg).take_all()
        }
        vis_arr = pa.array(sorted(visited), pa.string())
        extra_edges = (
            read_stage(paths["edges"], columns=["src_id", "dst_id", "pred"])
            .map_batches(
                lambda t: t.filter(
                    pc.and_(
                        pc.is_in(t["src_id"], value_set=vis_arr),
                        pc.is_in(t["dst_id"], value_set=vis_arr),
                    )
                ),
                batch_format="pyarrow",
            )
            .take_all()
        )
    # label fetch pruned to the NEIGHBORHOOD ids only (never the full
    # entity table — neighborhood-scale, not corpus-scale)
    need = {seed_id}
    for e in d["outbound"] + d["inbound"] + extra_edges:
        need.add(e["src_id"])
        need.add(e["dst_id"])
    need_arr = pa.array(sorted(need), pa.string())
    ents = {
        r["entity_id"]: r
        for r in read_stage(paths["entities"], columns=["entity_id", "name"])
        .map_batches(
            lambda t: t.filter(pc.is_in(t["entity_id"], value_set=need_arr)),
            batch_format="pyarrow",
        )
        .take_all()
    }

    def label(eid: str) -> str:
        return ents.get(eid, {}).get("name", eid[:8])

    lines = ["graph TD"]
    seen = set()
    for e in sorted(d["outbound"], key=lambda x: (x["pred"], x["dst_id"])):
        key = (e["src_id"], e["pred"], e["dst_id"])
        if key not in seen:
            seen.add(key)
            lines.append(
                f'  {e["src_id"][:8]}["{label(e["src_id"])}"] -->|{e["pred"]}| {e["dst_id"][:8]}["{label(e["dst_id"])}"]'
            )
    for e in sorted(d["inbound"], key=lambda x: (x["pred"], x["src_id"])):
        key = (e["src_id"], e["pred"], e["dst_id"])
        if key not in seen:
            seen.add(key)
            lines.append(
                f'  {e["src_id"][:8]}["{label(e["src_id"])}"] -->|{e["pred"]}| {e["dst_id"][:8]}["{label(e["dst_id"])}"]'
            )
    for e in sorted(extra_edges, key=lambda x: (x["src_id"], x["pred"], x["dst_id"])):
        key = (e["src_id"], e["pred"], e["dst_id"])
        if key not in seen:
            seen.add(key)
            lines.append(
                f'  {e["src_id"][:8]}["{label(e["src_id"])}"] -->|{e["pred"]}| {e["dst_id"][:8]}["{label(e["dst_id"])}"]'
            )
    return lines


def skeleton(paths: dict[str, str]) -> ray.data.Dataset:
    """Graph skeleton: (subj_type, pred, obj_type) → edge count + total
    weight. The rendered-hierarchy analog, as a typed adjacency rollup.

    The type labels are attached by two co-partitioned lookup joins
    against the entities table (one hash shuffle each) — no driver-side
    type dict, so an open-vocabulary entity table never has to fit on
    one machine."""
    from ..ops.joins import copartition_attach

    edges = read_stage(paths["edges"], columns=["src_id", "dst_id", "pred", "weight"])
    ents = read_stage(paths["entities"], columns=["entity_id", "type"])
    with_subj = copartition_attach(
        edges, ents, "src_id", "entity_id", {"type": "subj_type"}
    )
    with_both = copartition_attach(
        with_subj, ents, "dst_id", "entity_id", {"type": "obj_type"}
    )

    def project(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "subj_type": pc.cast(t["subj_type"], pa.string()),
                "pred": pc.cast(t["pred"], pa.string()),
                "obj_type": pc.cast(t["obj_type"], pa.string()),
                "weight": pc.cast(t["weight"], pa.int64()),
            }
        )

    from ray.data.aggregate import Count, Sum

    return (
        with_both.map_batches(project, batch_format="pyarrow")
        .groupby(["subj_type", "pred", "obj_type"])
        .aggregate(Count(alias_name="n_edges"), Sum("weight", alias_name="total_weight"))
    )


# --- declarative pattern matching -------------------------------------------


def _mp_cols(n_steps: int) -> list[str]:
    cols = ["n0"]
    for i in range(1, n_steps + 1):
        cols += [f"p{i}", f"n{i}"]
    return cols


def _mp_empty(n_steps: int) -> pa.Table:
    return pa.Table.from_pydict(
        {c: pa.array([], pa.string()) for c in _mp_cols(n_steps)}
    )


def match_pattern(
    paths: dict[str, str],
    steps: list[dict],
    src_type: str | None = None,
    start_ids: list[str] | None = None,
    distinct_nodes: bool = False,
    offset: int = 0,
    limit: int | None = 100,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> ray.data.Dataset:
    """Declarative graph-pattern matching — the Cypher
    ``MATCH (a)-[:P1]->(b)-[:P2]->(c)`` surface of the reference's
    Neo4j query layer (``queries.py`` path/relationship matches),
    re-expressed as a chain of co-partitioned equi-joins over the edge
    table.

    ``steps`` is a list of ``{"pred": str|None, "dst_type": str|None,
    "dir": "out"|"in"}`` hop constraints (``None`` = unconstrained;
    ``dir: "in"`` binds the REVERSED edge — Cypher's ``<-[:P]-`` form —
    via one map-only column swap, so both tiers share every code path);
    the start node set can be narrowed by ``src_type`` and/or
    ``start_ids``. Matching is over
    DISTINCT ``(src, pred, dst)`` triples (the KG is a multigraph;
    pattern semantics are set-based). Returns one row per binding with
    string columns ``n0, p1, n1, …, pK, nK`` in global lexicographic
    order, paged by ``offset``/``limit`` rows. ``distinct_nodes=True``
    drops bindings that revisit a node (Cypher's default allows
    revisits; so does this).

    Size-tiered on ``cfg.workflows_driver_max_edges`` (the traversal
    tier bound): below, pandas merges on the driver; above, each hop is
    ONE co-partitioned fan-out join (``ops/joins.copartition_join``) and
    each ``dst_type`` constraint one co-partitioned semi-join — bindings
    and triples move per hop, never the driver. Both tiers produce
    identical rows (forced-tier tested). Unselective patterns fan out
    multiplicatively — constrain hops (pred/type) the way you would in
    Cypher."""
    n_steps = len(steps)
    if n_steps == 0:
        return ray.data.from_arrow(_mp_empty(0))
    for st in steps:
        if st.get("dir") not in (None, "out", "in"):
            raise ValueError(
                f"step dir must be 'out' or 'in', got {st.get('dir')!r}"
            )
    edges_ds = read_stage(paths["edges"], columns=["src_id", "dst_id", "pred"])
    need_types = src_type is not None or any(s.get("dst_type") for s in steps)
    ents_ds = read_stage(paths["entities"], columns=["entity_id", "type"])
    if edges_ds.count() <= cfg.workflows_driver_max_edges:
        return _match_pattern_driver(
            edges_ds, ents_ds, steps, src_type, start_ids, distinct_nodes,
            offset, limit, need_types,
        )
    return _match_pattern_distributed(
        edges_ds, ents_ds, steps, src_type, start_ids, distinct_nodes,
        offset, limit, cfg,
    )


def _mp_page(df, n_steps: int, offset: int, limit: int | None) -> ray.data.Dataset:
    cols = _mp_cols(n_steps)
    df = df.sort_values(cols, kind="mergesort").reset_index(drop=True)
    end = (offset + limit) if limit is not None else len(df)
    df = df.iloc[offset:end]
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {c: pa.array(df[c].tolist(), pa.string()) for c in cols}
        )
    )


def _match_pattern_driver(
    edges_ds, ents_ds, steps, src_type, start_ids, distinct_nodes,
    offset, limit, need_types,
):
    import pandas as pd

    n_steps = len(steps)
    triples = edges_ds.to_pandas().drop_duplicates(["src_id", "pred", "dst_id"])
    ents = ents_ds.to_pandas() if need_types or start_ids is None else None
    if start_ids is not None:
        b = pd.DataFrame({"n0": sorted(set(start_ids))})
        if src_type is not None:
            typed = set(ents[ents["type"] == src_type]["entity_id"])
            b = b[b["n0"].isin(typed)]
    elif src_type is not None:
        b = pd.DataFrame({"n0": ents[ents["type"] == src_type]["entity_id"]})
    else:
        b = pd.DataFrame({"n0": ents["entity_id"]})
    types = dict(zip(ents["entity_id"], ents["type"])) if need_types else {}
    for i, step in enumerate(steps, start=1):
        e = triples
        if step.get("dir") == "in":
            e = e.rename(columns={"src_id": "dst_id", "dst_id": "src_id"})
        if step.get("pred") is not None:
            e = e[e["pred"] == step["pred"]]
        if step.get("dst_type") is not None:
            e = e[e["dst_id"].map(types) == step["dst_type"]]
        e = e.rename(
            columns={"src_id": f"n{i-1}", "pred": f"p{i}", "dst_id": f"n{i}"}
        )
        b = b.merge(e, on=f"n{i-1}", how="inner")
        if b.empty:
            return ray.data.from_arrow(_mp_empty(n_steps))
    if distinct_nodes:
        ncols = [f"n{i}" for i in range(n_steps + 1)]
        b = b[b[ncols].nunique(axis=1) == len(ncols)]
    return _mp_page(b, n_steps, offset, limit)


def _match_pattern_distributed(
    edges_ds, ents_ds, steps, src_type, start_ids, distinct_nodes,
    offset, limit, cfg,
):
    import pandas as pd

    from ..ops.joins import copartition_attach, copartition_join
    from ..util import compact_nonempty

    n_steps = len(steps)
    parts = max(
        1, min(cfg.agg_partitions, edges_ds.count() // cfg.cc_rows_per_partition + 1)
    )

    # distinct (src, pred, dst) triples: per-batch dedup partials, one
    # src-keyed exchange, per-partition dedup — rows move exactly once
    def dd_partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop_duplicates(["src_id", "pred", "dst_id"]).copy()
        g["_pkey"] = (
            pd.util.hash_array(g["src_id"].to_numpy(dtype=object)) % parts
        ).astype("int32")
        return g

    triples = compact_nonempty(
        edges_ds.map_batches(dd_partial, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(
            lambda g: g.drop_duplicates(["src_id", "pred", "dst_id"])[
                ["src_id", "pred", "dst_id"]
            ],
            batch_format="pandas",
        )
    )

    if start_ids is not None:
        start_arr = pa.array(sorted(set(start_ids)), pa.string())
        b = ents_ds.map_batches(
            lambda t: t.filter(pc.is_in(t["entity_id"], value_set=start_arr)),
            batch_format="pyarrow",
        )
    else:
        b = ents_ds
    if src_type is not None:
        b = b.map_batches(
            lambda t, _st=src_type: t.filter(pc.equal(t["type"], _st)),
            batch_format="pyarrow",
        )
    b = compact_nonempty(
        b.map_batches(
            lambda t: pa.Table.from_pydict({"n0": t["entity_id"]}),
            batch_format="pyarrow",
        )
    )
    for i, step in enumerate(steps, start=1):
        if b.count() == 0:
            return ray.data.from_arrow(_mp_empty(n_steps))
        e = triples
        if step.get("dir") == "in":
            e = e.map_batches(
                lambda t: pa.Table.from_pydict(
                    {
                        "src_id": t["dst_id"],
                        "pred": t["pred"],
                        "dst_id": t["src_id"],
                    }
                ),
                batch_format="pyarrow",
            )
        if step.get("pred") is not None:
            e = compact_nonempty(
                e.map_batches(
                    lambda t, _p=step["pred"]: t.filter(pc.equal(t["pred"], _p)),
                    batch_format="pyarrow",
                )
            )
        b = compact_nonempty(
            copartition_join(
                b, e, f"n{i-1}", "src_id",
                {"pred": f"p{i}", "dst_id": f"n{i}"}, partitions=parts,
            )
        )
        if step.get("dst_type") is not None:
            typed = compact_nonempty(
                ents_ds.map_batches(
                    lambda t, _dt=step["dst_type"]: pa.Table.from_pydict(
                        {"entity_id": t.filter(pc.equal(t["type"], _dt))["entity_id"]}
                    ),
                    batch_format="pyarrow",
                )
            )
            if typed.count() == 0:
                return ray.data.from_arrow(_mp_empty(n_steps))
            b = compact_nonempty(
                copartition_attach(
                    b, typed, f"n{i}", "entity_id", {"entity_id": "_m"},
                    partitions=parts, how="inner",
                ).map_batches(lambda df: df.drop(columns=["_m"]), batch_format="pandas")
            )
    if b.count() == 0:
        return ray.data.from_arrow(_mp_empty(n_steps))
    if distinct_nodes:
        ncols = [f"n{i}" for i in range(n_steps + 1)]
        b = compact_nonempty(
            b.map_batches(
                lambda df: df[df[ncols].nunique(axis=1) == len(ncols)],
                batch_format="pandas",
            )
        )
        if b.count() == 0:
            return ray.data.from_arrow(_mp_empty(n_steps))
    cols = _mp_cols(n_steps)
    b = b.sort(cols)
    if limit is not None:
        b = b.limit(offset + limit)
        if offset:
            return _mp_page(b.to_pandas(), n_steps, offset, limit)
        return b.map_batches(lambda df: df[cols], batch_format="pandas")
    if offset:
        return _mp_page(b.to_pandas(), n_steps, offset, None)
    return b.map_batches(lambda df: df[cols], batch_format="pandas")


# --- induced subgraph extraction ---------------------------------------------


def induced_subgraph(
    paths: dict[str, str],
    seed_ids: list[str],
    radius: int = 2,
    preds: list[str] | None = None,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> dict:
    """The radius-``radius`` out-neighborhood of ``seed_ids`` as a
    self-contained graph → ``{"entities": Dataset, "edges": Dataset,
    "n_entities": int, "n_edges": int}`` where edges are the INDUCED
    set (both endpoints inside the neighborhood) — the subgraph-export
    surface (hand an agent / visualizer a closed region instead of path
    rows).

    Node discovery is ``k_hop`` (size-tiered frontier). The induced
    filters are size-tiered on ``cfg.khop_broadcast_max``: a small
    neighborhood broadcasts ONE sorted id array and applies vectorized
    ``pc.is_in`` twice; a larger one never touches the driver — two
    co-partitioned semi-joins mark src/dst membership and one marks the
    entity rows."""
    import numpy as np
    import ray as _ray

    from ..ops.joins import copartition_attach
    from ..util import compact_nonempty, get_broadcast

    nodes = k_hop(paths, seed_ids, max_depth=radius, preds=preds, cfg=cfg)
    nodes = compact_nonempty(
        nodes.map_batches(
            lambda t: pa.Table.from_pydict({"entity_id": t["entity_id"]}),
            batch_format="pyarrow",
        )
    ).materialize()
    n_nodes = nodes.count()
    edges = read_stage(paths["edges"])
    if preds is not None:
        pred_arr = pa.array(sorted(set(preds)), pa.string())
        edges = edges.map_batches(
            lambda t: t.filter(pc.is_in(t["pred"], value_set=pred_arr)),
            batch_format="pyarrow",
        )
    ents = read_stage(paths["entities"])

    if n_nodes <= cfg.khop_broadcast_max:
        ids = sorted(r["entity_id"] for r in nodes.take_all())
        arr_ref = _ray.put(pa.array(ids, pa.string()))

        def edge_flt(t: pa.Table) -> pa.Table:
            arr = get_broadcast(arr_ref)
            return t.filter(
                pc.and_(
                    pc.is_in(t["src_id"], value_set=arr),
                    pc.is_in(t["dst_id"], value_set=arr),
                )
            )

        def ent_flt(t: pa.Table) -> pa.Table:
            arr = get_broadcast(arr_ref)
            return t.filter(pc.is_in(t["entity_id"], value_set=arr))

        sub_edges = edges.map_batches(edge_flt, batch_format="pyarrow")
        sub_ents = ents.map_batches(ent_flt, batch_format="pyarrow")
    else:
        marks = nodes.map_batches(
            lambda t: t.append_column(
                "_m", pa.array(np.ones(t.num_rows, np.int8))
            ),
            batch_format="pyarrow",
        )
        parts = max(1, min(cfg.agg_partitions, n_nodes // cfg.cc_rows_per_partition + 1))
        e1 = compact_nonempty(
            copartition_attach(
                edges, marks, "src_id", "entity_id", {"_m": "_ms"},
                partitions=parts, how="inner",
            )
        )
        ecols = [c for c in edges.schema().names]
        sub_edges = compact_nonempty(
            copartition_attach(
                e1, marks, "dst_id", "entity_id", {"_m": "_md"},
                partitions=parts, how="inner",
            )
        ).map_batches(lambda df: df[ecols], batch_format="pandas")
        # the aliases list column can't round-trip the pandas merge —
        # encode to JSON for the semi-join, restore after
        import json

        entcols = [c for c in ents.schema().names]

        def enc(t: pa.Table) -> pa.Table:
            enc_col = pa.array(
                [json.dumps(a) for a in t["aliases"].to_pylist()], pa.string()
            )
            return t.drop_columns(["aliases"]).append_column("_aliases", enc_col)

        def dec(df):
            df = df.copy()
            df["aliases"] = [json.loads(a) for a in df["_aliases"]]
            return df[entcols]

        sub_ents = compact_nonempty(
            copartition_attach(
                ents.map_batches(enc, batch_format="pyarrow"),
                marks, "entity_id", "entity_id", {"_m": "_m"},
                partitions=parts, how="inner",
            )
        ).map_batches(dec, batch_format="pandas")

    sub_edges = sub_edges.materialize()
    sub_ents = sub_ents.materialize()
    return {
        "entities": sub_ents,
        "edges": sub_edges,
        "n_entities": sub_ents.count(),
        "n_edges": sub_edges.count(),
    }
