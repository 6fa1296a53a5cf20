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


def node_detail(
    paths: dict[str, str], eid: str, cfg: PipelineConfig = DEFAULT_CONFIG
) -> dict:
    """Point lookup with hash-partition pruning: read ONE bucket dir for
    the entity row; edges are scanned only in the src bucket (outbound)
    plus a filtered scan for inbound."""
    b = id_bucket(eid, cfg.num_buckets)
    ent = None
    for f in _bucket_files(paths["entities"], b):
        t = pq.read_table(f)
        m = t.filter(pc.equal(t["entity_id"], eid))
        if m.num_rows:
            ent = m.to_pylist()[0]
            break
    if ent is None:
        return {"entity": None, "outbound": [], "inbound": []}
    out = []
    for f in _bucket_files(paths["edges"], b):
        t = pq.read_table(f)
        out.extend(t.filter(pc.equal(t["src_id"], eid)).to_pylist())
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
) -> ray.data.Dataset:
    """Iterative frontier expansion over the edges table: each round is a
    broadcast-semi-join (frontier id set) + vectorized filter, the Ray
    shape of the reference's bounded DFS (maxDepth, NODE_PATH
    uniqueness). Returns ds[(entity_id, depth)] with minimal depth."""
    edges = read_stage(paths["edges"], columns=["src_id", "dst_id", "pred"]).materialize()
    seen: dict[str, int] = {s: 0 for s in seed_ids}
    frontier = set(seed_ids)
    for depth in range(1, max_depth + 1):
        fr_arr = pa.array(sorted(frontier), pa.string())  # once per round

        def step(t: pa.Table, _fr=fr_arr) -> pa.Table:
            t = t.filter(pc.is_in(t["src_id"], value_set=_fr))
            if preds is not None:
                t = t.filter(pc.is_in(t["pred"], value_set=pa.array(preds)))
            return t.select(["dst_id"])

        nxt = {
            r["dst_id"]
            for r in edges.map_batches(step, batch_format="pyarrow").take_all()
        }
        frontier = {n for n in nxt if n not in seen}
        if not frontier:
            break
        for n in frontier:
            seen[n] = depth
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

    The edge list is entity-scale (aggregated triples), so the adjacency
    lives on the driver; at 10^12-corpus scale this becomes the
    iterative frontier-join form of ``k_hop`` with path-id columns.

    Returns ds[(entry_id, path_id, step, src_id, pred, dst_id)].
    """
    edges = read_stage(paths["edges"], columns=["src_id", "dst_id", "pred"]).take_all()
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


def render_mermaid(paths: dict[str, str], seed_id: str, cfg: PipelineConfig = DEFAULT_CONFIG) -> list[str]:
    """Mermaid flowchart lines for a node's 1-hop neighborhood — the
    graph-rendering formatter (``queries.py:1850-2060`` analog)."""
    d = node_detail(paths, seed_id, cfg)
    if d["entity"] is None:
        return ["graph TD", f'  missing["{seed_id} (not found)"]']
    # label fetch pruned to the NEIGHBORHOOD ids only (never the full
    # entity table — neighborhood-scale, not corpus-scale)
    need = {seed_id}
    for e in d["outbound"] + d["inbound"]:
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
