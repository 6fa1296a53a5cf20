"""Agent-tool surface over a built KG — the analog of the reference's
tool registry + MCP server (``blarify/tools/__init__.py:1-29``,
``blarify/mcp_server/server.py:37-120``): a declarative registry of
named tools (JSON-schema'd inputs, JSON rows out) over the materialized
graph, plus a dependency-free MCP-style JSON-RPC stdio loop
(``serve_mcp_stdio``) so an agent host can call them without any
network service.

Every handler takes the stage-paths dict of a completed ``build_kg`` run
and returns JSON-serializable data; Ray must already be initialized by
the caller (library code never owns the session)."""

from __future__ import annotations

import json
import sys
from collections.abc import Callable
from dataclasses import dataclass, field


@dataclass(frozen=True)
class Tool:
    name: str
    description: str
    handler: Callable
    params: dict = field(default_factory=dict)  # name → JSON-schema fragment
    required: tuple[str, ...] = ()

    def input_schema(self) -> dict:
        return {
            "type": "object",
            "properties": dict(self.params),
            "required": list(self.required),
        }


def _rows(ds) -> list[dict]:
    return ds.take_all() if hasattr(ds, "take_all") else list(ds)


def _t_entity_details(paths: dict[str, str], entity_id: str) -> dict:
    from .pipelines.graph_queries import node_detail

    return node_detail(paths, entity_id)


def _t_find_by_name(paths: dict[str, str], name: str) -> list[dict]:
    from .pipelines.graph_queries import find_entities

    return _rows(find_entities(paths, name))


def _t_doc_context(paths: dict[str, str], url: str) -> dict:
    from .pipelines.graph_queries import doc_context

    return doc_context(paths, url)


def _t_k_hop(paths: dict[str, str], seed_ids: list[str], max_depth: int = 3,
             offset: int = 0, limit: int | None = None,
             direction: str = "out") -> list[dict]:
    from .pipelines.graph_queries import k_hop

    return _rows(
        k_hop(
            paths, seed_ids, max_depth=max_depth, offset=offset, limit=limit,
            direction=direction,
        )
    )


def _t_workflows(paths: dict[str, str], max_depth: int = 6,
                 offset: int = 0, limit: int | None = None) -> list[dict]:
    from .pipelines.graph_queries import workflows

    return _rows(workflows(paths, max_depth=max_depth, offset=offset, limit=limit))


def _t_entry_points(paths: dict[str, str]) -> list[dict]:
    from .pipelines.graph_queries import entry_points

    return _rows(entry_points(paths))


def _t_skeleton(paths: dict[str, str]) -> list[dict]:
    from .pipelines.graph_queries import skeleton

    return _rows(skeleton(paths))


def _t_top_entities(paths: dict[str, str], k: int = 20) -> list[dict]:
    from .pipelines.graph_queries import top_entities

    return _rows(top_entities(paths, k=k))


def _t_mermaid(paths: dict[str, str], entity_id: str, depth: int = 1) -> str:
    from .pipelines.graph_queries import render_mermaid

    return "\n".join(render_mermaid(paths, entity_id, depth=depth))


def _t_vector_search(paths: dict[str, str], query: str, k: int = 10) -> list[dict]:
    from .pipelines.doc_layer import doc_search

    return _rows(doc_search(paths, query, k=k))


def _t_hybrid_search(paths: dict[str, str], query: str, k: int = 10) -> list[dict]:
    from .pipelines.doc_layer import doc_search_hybrid

    return _rows(doc_search_hybrid(paths, query, k=k))


def _t_skeleton_tree(paths: dict[str, str], max_children: int = 50) -> str:
    from .pipelines.graph_queries import render_skeleton_tree

    return "\n".join(render_skeleton_tree(paths, max_children=max_children))


def _t_domain_rollup(paths: dict[str, str]) -> list[dict]:
    from .pipelines.hierarchy import bottom_up_rollup

    return _rows(bottom_up_rollup(paths))


def _t_pagerank(paths: dict[str, str], k: int = 20) -> list[dict]:
    from .pipelines.graph_analytics import top_pagerank

    return _rows(top_pagerank(paths, k=k))


def _t_components(paths: dict[str, str], k: int = 20) -> list[dict]:
    from .pipelines.graph_analytics import component_sizes

    return _rows(component_sizes(paths, k=k))


def _t_related(paths: dict[str, str], seed_ids: list[str], k: int = 20) -> list[dict]:
    from .pipelines.graph_analytics import related_entities

    return _rows(related_entities(paths, seed_ids, k=k))


def _t_path_between(paths: dict[str, str], src_id: str, dst_id: str,
                    max_depth: int = 6) -> list[dict]:
    from .pipelines.graph_analytics import path_between

    return path_between(paths, src_id, dst_id, max_depth=max_depth)


def _t_strongest_path(
    paths: dict[str, str], src_id: str, dst_id: str, max_rounds: int = 12
) -> dict:
    from .pipelines.graph_analytics import strongest_path

    return strongest_path(paths, src_id, dst_id, max_rounds=max_rounds)


def _t_blame(paths: dict[str, str], entity_id: str) -> dict:
    from .pipelines.enrich import blame_info

    return blame_info(paths, entity_id)


def _t_entity_mentions(paths: dict[str, str], entity_id: str, limit: int = 100) -> list[dict]:
    from .pipelines.graph_queries import entity_mentions

    return entity_mentions(paths, entity_id, limit=limit)


def _t_graph_stats(paths: dict[str, str], k_core_k: int = 2) -> dict:
    import pyarrow as pa

    from .config import DEFAULT_CONFIG
    from .ops.graph import _parts_for, canonical_edges, k_core, triangle_stats
    from .state.manifest import read_stage

    # canonicalize the undirected edge set ONCE and share it across both
    # algorithms — two independent wrapper calls would each re-scan and
    # re-dedup the whole edges stage
    pairs = read_stage(paths["edges"], columns=["src_id", "dst_id"]).map_batches(
        lambda t: pa.Table.from_pydict({"x": t["src_id"], "y": t["dst_id"]}),
        batch_format="pyarrow",
    ).materialize()
    parts = _parts_for(max(pairs.count(), 1), DEFAULT_CONFIG)
    can = canonical_edges(pairs, parts).materialize()
    census = triangle_stats(can, pairs_canonical=True)
    return {
        "n_edges": int(census["n_edges"]),
        "n_wedges": int(census["n_wedges"]),
        "n_triangles": int(census["n_triangles"]),
        "global_clustering": float(census["global_cc"]),
        "k_core_k": int(k_core_k),
        "k_core_size": k_core(can, k_core_k, pairs_canonical=True).count(),
    }


def _t_communities(
    paths: dict[str, str], k: int = 10, iters: int = 5,
    with_modularity: bool = False,
):
    from .pipelines.graph_analytics import top_communities

    if not with_modularity:
        return top_communities(paths, k=k, iters=iters).take_all()
    from ray.data.aggregate import Count

    from .ops.graph import modularity
    from .pipelines.graph_analytics import label_propagation
    from .state.manifest import read_stage

    # ONE label-propagation run feeds both outputs (top_communities would
    # re-run it, and modularity consumes the assignment twice)
    labeled = label_propagation(paths, iters=iters).materialize()
    top = (
        labeled.groupby("community")
        .aggregate(Count(alias_name="n_members"))
        .sort(["n_members", "community"], descending=[True, False])
        .limit(k)
        .take_all()
    )
    assign = labeled.map_batches(
        lambda df: df.rename(columns={"entity_id": "node"}),
        batch_format="pandas",
    ).materialize()
    pairs = read_stage(paths["edges"], columns=["src_id", "dst_id"]).map_batches(
        lambda df: df.rename(columns={"src_id": "x", "dst_id": "y"}),
        batch_format="pandas",
    ).materialize()
    from .ops.graph import community_stats

    top_ids = {r["community"] for r in top}
    stats = (
        community_stats(pairs, assign)
        .map_batches(
            lambda df: df[df["community"].isin(top_ids)],
            batch_format="pandas",
        )
        .take_all()
    )
    return {
        "communities": top,
        "modularity": modularity(pairs, assign),
        "stats": sorted(stats, key=lambda r: -r["volume"]),
    }


def _t_match_pattern(
    paths: dict[str, str],
    steps: list | None = None,
    src_type: str | None = None,
    start_ids: list | None = None,
    distinct_nodes: bool = False,
    offset: int = 0,
    limit: int = 50,
) -> list[dict]:
    from .pipelines.graph_queries import match_pattern

    return match_pattern(
        paths,
        steps or [{}],
        src_type=src_type,
        start_ids=start_ids,
        distinct_nodes=distinct_nodes,
        offset=offset,
        limit=limit,
    ).take_all()


def _t_export_subgraph(
    paths: dict[str, str],
    seed_ids: list,
    radius: int = 2,
    out_dir: str | None = None,
    limit: int = 200,
) -> dict:
    from .pipelines.graph_queries import induced_subgraph

    sub = induced_subgraph(paths, list(seed_ids), radius=radius)
    out = {"n_entities": sub["n_entities"], "n_edges": sub["n_edges"]}
    if out_dir:
        import os

        os.makedirs(out_dir, exist_ok=True)
        sub["entities"].write_parquet(os.path.join(out_dir, "entities"))
        sub["edges"].write_parquet(os.path.join(out_dir, "edges"))
        out["out_dir"] = out_dir
    else:
        out["entities"] = sub["entities"].limit(limit).take_all()
        out["edges"] = sub["edges"].limit(limit).take_all()
    return out


def _t_find_cycles(paths: dict[str, str], k: int = 10) -> list[dict]:
    from .pipelines.graph_analytics import scc_sizes

    rows = scc_sizes(paths, k=k).take_all()
    return [r for r in rows if r["n_members"] >= 2]


def _t_trending(paths: dict[str, str], k: int = 10) -> list[dict]:
    from .pipelines.graph_analytics import entity_trends

    # filter to burst rows INSIDE the dataset (a tiny fraction) — the
    # full (entity × window) trend table never reaches the driver
    bursts = (
        entity_trends(paths)
        .map_batches(lambda df: df[df["is_burst"]], batch_format="pandas")
        .sort(["n_mentions", "entity_id", "win_start"], descending=[True, False, False])
        .limit(k)
    )
    return bursts.take_all()


def _t_centrality(paths: dict[str, str], k: int = 10) -> dict:
    from .ops.hyperball import effective_diameter
    from .pipelines.graph_analytics import hyperball_summary

    top, dist = hyperball_summary(paths, k=k)  # ONE register-propagation run
    return {
        "top_harmonic": top,
        "effective_diameter": effective_diameter(dist),
        "distance_distribution": dist.to_dict(orient="records"),
    }


def _t_betweenness(paths: dict[str, str], k: int = 10, k_sources: int = 16) -> dict:
    from .pipelines.graph_analytics import top_betweenness

    top = top_betweenness(paths, k=k, k_sources=k_sources)
    return {"top_betweenness": top.to_dict(orient="records"),
            "k_sources": k_sources}


_ID = {"type": "string", "description": "entity_id (md5 hex)"}
_K = {"type": "integer", "default": 10}
_PAGE = {
    "offset": {"type": "integer", "default": 0},
    "limit": {"type": ["integer", "null"], "default": None},
}

TOOLS: dict[str, Tool] = {
    t.name: t
    for t in [
        Tool("get_entity_details",
             "Entity row plus inbound/outbound edges (partition-pruned point lookup)",
             _t_entity_details, {"entity_id": _ID}, ("entity_id",)),
        Tool("find_entities_by_name",
             "Substring search over entity names and aliases",
             _t_find_by_name, {"name": {"type": "string"}}, ("name",)),
        Tool("get_document_context",
             "Doc row for a url plus its mentions and triples",
             _t_doc_context, {"url": {"type": "string"}}, ("url",)),
        Tool("k_hop_neighborhood",
             "Entities within k hops of seed ids (minimal depth), paged; "
             "direction follows outgoing edges, inbound references, or both",
             _t_k_hop,
             {"seed_ids": {"type": "array", "items": {"type": "string"}},
              "max_depth": {"type": "integer", "default": 3},
              "direction": {"type": "string", "enum": ["out", "in", "both"],
                            "default": "out"}, **_PAGE},
             ("seed_ids",)),
        Tool("workflow_traces",
             "DFS execution traces from entry points (depth-capped, LCP-deduped), paged",
             _t_workflows, {"max_depth": {"type": "integer", "default": 6}, **_PAGE}),
        Tool("entry_points",
             "Entities with outgoing but no incoming edges",
             _t_entry_points),
        Tool("graph_skeleton",
             "Typed adjacency rollup: (subj_type, pred, obj_type) edge stats",
             _t_skeleton),
        Tool("top_entities",
             "Top-k entities by mention count",
             _t_top_entities, {"k": _K}),
        Tool("render_mermaid",
             "Mermaid flowchart of a node's depth-N neighborhood",
             _t_mermaid,
             {"entity_id": _ID, "depth": {"type": "integer", "default": 1}},
             ("entity_id",)),
        Tool("vector_search",
             "Cosine top-k over the documentation layer",
             _t_vector_search, {"query": {"type": "string"}, "k": _K}, ("query",)),
        Tool("hybrid_search",
             "0.7*vector + 0.3*keyword search with name/title boost",
             _t_hybrid_search, {"query": {"type": "string"}, "k": _K}, ("query",)),
        Tool("domain_rollup",
             "Bottom-up hierarchical aggregation over url domains",
             _t_domain_rollup),
        Tool("skeleton_tree",
             "Indented tree render of the corpus hierarchy (root/tld/domain)",
             _t_skeleton_tree, {"max_children": {"type": "integer", "default": 50}}),
        Tool("top_pagerank",
             "Top-k entities by PageRank (damped, weighted, size-tiered iteration)",
             _t_pagerank, {"k": _K}),
        Tool("graph_components",
             "Top-k weakly-connected components by member count",
             _t_components, {"k": _K}),
        Tool("related_entities",
             "Top-k entities related to seed ids (personalized PageRank)",
             _t_related,
             {"seed_ids": {"type": "array", "items": {"type": "string"}}, "k": _K},
             ("seed_ids",)),
        Tool("path_between",
             "One shortest directed path between two entities (BFS, depth-capped)",
             _t_path_between,
             {"src_id": _ID, "dst_id": _ID,
              "max_depth": {"type": "integer", "default": 6}},
             ("src_id", "dst_id")),
        Tool("get_blame_info",
             "Per-entity change history (MODIFIED_BY, newest first) plus "
             "most-specific-span attribution of each mention position",
             _t_blame, {"entity_id": _ID}, ("entity_id",)),
        Tool("get_entity_mentions",
             "Usage sites of an entity: resolved mention occurrences "
             "(url, sentence, surface), bucket-pruned point lookup",
             _t_entity_mentions,
             {"entity_id": _ID, "limit": {"type": "integer", "default": 100}},
             ("entity_id",)),
        Tool("graph_structure_stats",
             "Whole-graph structure diagnostics: exact triangle census "
             "(edges/wedges/triangles, global clustering coefficient) "
             "plus the k-core size",
             _t_graph_stats,
             {"k_core_k": {"type": "integer", "default": 2}}),
        Tool("get_communities",
             "Top-k communities by member count (deterministic "
             "label-propagation over the undirected KG)",
             _t_communities,
             {"with_modularity": {"type": "boolean", "default": False},
              "k": _K, "iters": {"type": "integer", "default": 5}}),
        Tool("match_pattern",
             "Declarative graph-pattern match (Cypher MATCH analog): "
             "bind a chain (n0)-[p1]->(n1)-[p2]->… with optional "
             "per-hop predicate / destination-type / direction "
             "constraints (dir:'in' = the <-[:P]- form); "
             "lexicographically ordered, paged bindings",
             _t_match_pattern,
             {"steps": {"type": "array",
                        "items": {"type": "object"},
                        "description": "per-hop {pred, dst_type} constraints"},
              "src_type": {"type": ["string", "null"], "default": None},
              "start_ids": {"type": ["array", "null"], "default": None},
              "distinct_nodes": {"type": "boolean", "default": False},
              "offset": {"type": "integer", "default": 0},
              "limit": {"type": "integer", "default": 50}}),
        Tool("export_subgraph",
             "Extract the radius-N out-neighborhood of seed entities as "
             "a self-contained induced subgraph (entities + edges with "
             "both endpoints inside) — inline rows or parquet export",
             _t_export_subgraph,
             {"seed_ids": {"type": "array", "items": {"type": "string"}},
              "radius": {"type": "integer", "default": 2},
              "out_dir": {"type": ["string", "null"], "default": None},
              "limit": {"type": "integer", "default": 200}}),
        Tool("strongest_path",
             "Widest (bottleneck) path between two entities: the chain "
             "maximizing the minimum co-mention weight along it — the "
             "evidence-strength complement of path_between's hop count",
             _t_strongest_path,
             {"src_id": _ID, "dst_id": _ID,
              "max_rounds": {"type": "integer", "default": 12}},
             ("src_id", "dst_id")),
        Tool("find_cycles",
             "Directed reference cycles: strongly connected components "
             "with 2+ members, largest first (circular-dependency view)",
             _t_find_cycles,
             {"k": _K}),
        Tool("get_trending_entities",
             "Bursting entities on the crawl timeline: windows where an "
             "entity's mention count exceeds its leave-one-out baseline "
             "by 2 standard deviations, largest spikes first",
             _t_trending,
             {"k": _K}),
        Tool("get_centrality",
             "HyperBall distance analytics: top-k entities by harmonic "
             "centrality (with reachable-set estimates), the graph's "
             "effective diameter, and the neighborhood function N(t)",
             _t_centrality,
             {"k": _K}),
        Tool("get_betweenness",
             "Top-k entities by sampled betweenness centrality (Brandes "
             "dependency accumulation from k_sources deterministic "
             "sources, scaled n/k) — the broker/bottleneck view of the "
             "graph, complementing PageRank and harmonic centrality",
             _t_betweenness,
             {"k": _K, "k_sources": {"type": "integer", "default": 16}}),
    ]
}


def call_tool(paths: dict[str, str], name: str, arguments: dict | None = None):
    tool = TOOLS.get(name)
    if tool is None:
        raise KeyError(f"unknown tool: {name}")
    return tool.handler(paths, **(arguments or {}))


def list_tools() -> list[dict]:
    return [
        {"name": t.name, "description": t.description, "inputSchema": t.input_schema()}
        for t in TOOLS.values()
    ]


def serve_mcp_stdio(paths: dict[str, str], stdin=None, stdout=None) -> None:
    """Minimal MCP-shaped JSON-RPC loop over stdio (one JSON object per
    line): handles ``initialize``, ``tools/list`` and ``tools/call`` —
    the surface the reference's MCP server exposes
    (``mcp_server/server.py:37-120``) — without any network dependency.
    Runs until EOF."""
    stdin = stdin or sys.stdin
    stdout = stdout or sys.stdout
    for line in stdin:
        line = line.strip()
        if not line:
            continue
        try:
            req = json.loads(line)
        except json.JSONDecodeError:
            continue
        rid = req.get("id")
        method = req.get("method", "")
        try:
            if method == "initialize":
                result = {
                    "protocolVersion": "2024-11-05",
                    "serverInfo": {"name": "blarify_ray", "version": "0.2"},
                    "capabilities": {"tools": {}},
                }
            elif method == "tools/list":
                result = {"tools": list_tools()}
            elif method == "tools/call":
                params = req.get("params", {})
                out = call_tool(paths, params.get("name", ""), params.get("arguments"))
                result = {
                    "content": [{"type": "text", "text": json.dumps(out, default=str)}]
                }
            elif method.startswith("notifications/"):
                continue  # notifications carry no response
            else:
                raise KeyError(f"unknown method: {method}")
            resp = {"jsonrpc": "2.0", "id": rid, "result": result}
        except Exception as e:  # tool errors surface as JSON-RPC errors
            resp = {"jsonrpc": "2.0", "id": rid, "error": {"code": -32000, "message": str(e)}}
        stdout.write(json.dumps(resp, default=str) + "\n")
        stdout.flush()
