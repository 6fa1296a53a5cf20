"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship KG-construction pipeline on an
sf0.001-scale synthetic page corpus. ``queries()`` exposes every
implemented operator/pipeline (SURVEY.md §2); entries with a matching
``oracle_sql()`` are verified against DuckDB at sf0.01, the KG-pipeline
entries (non-SQL-expressible: NER, MinHash-LSH, union-find) get the
rows-only check and are instead verified exactly against the serial
golden reference by ``python -m pytest -x -q``.

Ray is initialised by the driver BEFORE this module is imported: nothing
here calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

import os
from collections.abc import Callable
from typing import Any

CACHE_ROOT = "/tmp/blarify_ray_cache"


def _kg_paths(sf_dir: str) -> dict[str, str]:
    """Build (or resume from checkpoint) the KG for the corpus size tied
    to sf_dir; all kg_* queries share the checkpointed build."""
    from blarify_ray.pipelines.kg_build import build_kg
    from blarify_ray.sources.pages import pages_count_for_sf

    n_pages = pages_count_for_sf(sf_dir)
    out_dir = os.path.join(CACHE_ROOT, f"kg_n{n_pages}")
    return build_kg(out_dir, n_pages)


def _stage_ds(path: str, columns=None):
    from blarify_ray.state.manifest import read_stage

    return read_stage(path, columns=columns)


def entry() -> Any:
    """Flagship pipeline at sf0.001 scale: synth pages → extract → NER +
    triples + link → canonicalize → entities table."""
    paths = _kg_paths("/root/testdata/sf0.001")
    return _stage_ds(paths["entities"])


# --- KG pipeline queries (rows-only driver check; exact check in pytest) --

def _q_kg_docs(sf_dir: str):
    paths = _kg_paths(sf_dir)
    return _stage_ds(paths["docs"], columns=["url", "warc_ts", "lang", "raw", "n_sents"])


def _q_kg_mentions(sf_dir: str):
    paths = _kg_paths(sf_dir)
    return _stage_ds(paths["mentions"])


def _q_kg_triples(sf_dir: str):
    from blarify_ray.pipelines.kg_build import triples_table

    return triples_table(_kg_paths(sf_dir))


def _q_kg_entities(sf_dir: str):
    return _stage_ds(_kg_paths(sf_dir)["entities"])


def _q_kg_edges(sf_dir: str):
    return _stage_ds(_kg_paths(sf_dir)["edges"])


# --- KG query layer (SURVEY §2.7 parity; rows-only driver check) ----------

def _q_kg_top_entities(sf_dir: str):
    from blarify_ray.pipelines.graph_queries import top_entities

    return top_entities(_kg_paths(sf_dir), k=20)


def _q_kg_entry_points(sf_dir: str):
    from blarify_ray.pipelines.graph_queries import entry_points

    return entry_points(_kg_paths(sf_dir))


def _q_kg_skeleton(sf_dir: str):
    from blarify_ray.pipelines.graph_queries import skeleton

    return skeleton(_kg_paths(sf_dir))


def _q_kg_khop(sf_dir: str):
    from blarify_ray.pipelines.graph_queries import k_hop, top_entities

    paths = _kg_paths(sf_dir)
    seed = top_entities(paths, k=1).take_all()[0]["entity_id"]
    return k_hop(paths, [seed], max_depth=3)


def _q_kg_find(sf_dir: str):
    from blarify_ray.pipelines.graph_queries import find_entities

    return find_entities(_kg_paths(sf_dir), "Data")


def _q_kg_workflows(sf_dir: str):
    from blarify_ray.pipelines.graph_queries import workflows

    return workflows(_kg_paths(sf_dir), max_depth=5)


def _q_kg_doc_search(sf_dir: str):
    from blarify_ray.pipelines.doc_layer import doc_search
    from blarify_ray.pipelines.graph_queries import top_entities

    paths = _kg_paths(sf_dir)
    top = top_entities(paths, k=1).take_all()[0]["name"]
    return doc_search(paths, f"information about {top}", k=10)


def _q_kg_doc_search_hybrid(sf_dir: str):
    from blarify_ray.pipelines.doc_layer import doc_search_hybrid
    from blarify_ray.pipelines.graph_queries import top_entities

    paths = _kg_paths(sf_dir)
    top = top_entities(paths, k=1).take_all()[0]["name"]
    return doc_search_hybrid(paths, f"information about {top}", k=10)


def _q_kg_external(sf_dir: str):
    """External-enrichment connector (GitHub-integration analog): attach
    synthetic change/review records to KG entities as MODIFIED_BY edges."""
    from blarify_ray.corpus import entity_universe
    from blarify_ray.linking import known_alias_norms
    from blarify_ray.pipelines.enrich import (
        attach_external,
        external_edges_view,
        synth_external_records,
    )
    from blarify_ray.rules import Gazetteer
    from blarify_ray.sources.pages import pages_count_for_sf

    n_pages = pages_count_for_sf(sf_dir)
    _kg_paths(sf_dir)  # ensure the KG exists (shared checkpoint)
    out_dir = os.path.join(CACHE_ROOT, f"kg_n{n_pages}")
    known = known_alias_norms(Gazetteer(entity_universe(n_pages)))
    records = synth_external_records(max(200, n_pages // 25), n_pages)
    path = attach_external(out_dir, records, known, source_fingerprint=f"ext-{n_pages}")
    return external_edges_view(path)


def _q_kg_domain_rollup(sf_dir: str):
    from blarify_ray.pipelines.hierarchy import bottom_up_rollup

    return bottom_up_rollup(_kg_paths(sf_dir))


def _q_kg_mermaid(sf_dir: str):
    import pandas as pd

    from blarify_ray.pipelines.graph_queries import render_mermaid, top_entities

    paths = _kg_paths(sf_dir)
    seed = top_entities(paths, k=1).take_all()[0]["entity_id"]
    return pd.DataFrame({"line": render_mermaid(paths, seed)})


def _q_kg_pagerank(sf_dir: str):
    from blarify_ray.pipelines.graph_analytics import top_pagerank

    return top_pagerank(_kg_paths(sf_dir), k=50)


def _q_kg_components(sf_dir: str):
    from blarify_ray.pipelines.graph_analytics import component_sizes

    return component_sizes(_kg_paths(sf_dir), k=20)


def _q_kg_betweenness(sf_dir: str):
    from blarify_ray.pipelines.graph_analytics import top_betweenness

    return top_betweenness(_kg_paths(sf_dir), k=50, k_sources=16)


def _q_kg_triangles(sf_dir: str):
    from blarify_ray.pipelines.graph_analytics import triangle_census

    return triangle_census(_kg_paths(sf_dir))


def _q_kg_kcore(sf_dir: str):
    from blarify_ray.pipelines.graph_analytics import k_core_entities

    return k_core_entities(_kg_paths(sf_dir), k=2)


def _q_kg_communities(sf_dir: str):
    from blarify_ray.pipelines.graph_analytics import top_communities

    return top_communities(_kg_paths(sf_dir), k=20)


def _q_kg_pattern(sf_dir: str):
    from blarify_ray.pipelines.graph_queries import match_pattern

    return match_pattern(
        _kg_paths(sf_dir), [{}, {}], distinct_nodes=True, limit=200
    )


def _q_kg_centrality(sf_dir: str):
    from blarify_ray.pipelines.graph_analytics import top_harmonic

    return top_harmonic(_kg_paths(sf_dir), k=20)


def _q_kg_strongest_path(sf_dir: str):
    import pandas as pd

    from blarify_ray.pipelines.graph_analytics import strongest_path
    from blarify_ray.pipelines.graph_queries import top_entities

    from blarify_ray.pipelines.graph_queries import k_hop

    paths = _kg_paths(sf_dir)
    seed = top_entities(paths, k=1).take_all()[0]["entity_id"]
    # destination: the deepest (then largest-id) entity reachable in 2
    # hops — guarantees a non-trivial path exists
    reach = sorted(
        ((r["depth"], r["entity_id"]) for r in k_hop(paths, [seed], max_depth=2).take_all()),
        reverse=True,
    )
    dst = reach[0][1] if reach and reach[0][1] != seed else seed
    r = strongest_path(paths, seed, dst)
    return pd.DataFrame(r["steps"], columns=["src_id", "dst_id", "weight"])


def _q_kg_scc(sf_dir: str):
    from blarify_ray.pipelines.graph_analytics import scc_sizes

    return scc_sizes(_kg_paths(sf_dir), k=20)


def _q_kg_trends(sf_dir: str):
    from blarify_ray.pipelines.graph_analytics import entity_trends

    return entity_trends(_kg_paths(sf_dir))


def _q_kg_walks(sf_dir: str):
    from blarify_ray.pipelines.graph_analytics import random_walks

    return random_walks(_kg_paths(sf_dir), walk_len=6, walks_per_node=1)


def _q_kg_skeleton_tree(sf_dir: str):
    import pandas as pd

    from blarify_ray.pipelines.graph_queries import render_skeleton_tree

    return pd.DataFrame({"line": render_skeleton_tree(_kg_paths(sf_dir))})


# Driver-row rotation (the driver snapshots at most ~50 entries per
# round, in dict order): round 5 front-loads the 32 oracle queries that
# have NEVER had a driver row in CORRECTNESS_r01–r04, then the queries
# whose implementations changed this round, then fresh round-5 oracle
# additions — so after this round every oracle query has been
# driver-checked at least once (union tracked in COVERAGE.md).
_DRIVER_PRIORITY = [
    # never driver-checked through r4 (32)
    "block_dedup_docs", "negative_samples", "pii_redact_docs",
    "fuzzy_contamination", "shuffle_shards_docs", "span_removed_docs",
    "pack_chunks_docs", "knn_graph", "vector_range_count",
    "copurchase_two_hop", "copurchase_local_cc", "copurchase_triangles",
    "copurchase_degree_hist", "copurchase_assortativity",
    "chars_percentiles_by_lang", "ntile_chars_by_source",
    "mode_event_per_user", "rolling_value_7d", "event_transitions",
    "conversion_lag", "repeat_buyers", "idle_rich_customers",
    "lineitem_profile", "orders_status_pivot", "late_orders_by_priority",
    "urgent_lineitem_revenue", "small_qty_revenue", "nation_market_share",
    "cheapest_part_per_brand", "sole_late_supplier", "corr_qty_discount",
    "props_value_stats",
    # re-checked this round: implementations rewritten (r5)
    "vector_topk", "doc_stats_top10",
]


def queries() -> dict[str, Callable[[str], Any]]:
    """Ordered so the DuckDB-oracle-backed queries land driver rows
    first (the round driver records at most ~50 entries per sweep), with
    an explicit rotation list so every oracle query is driver-checked at
    least once across rounds."""
    from blarify_ray.pipelines import analytics, training_ops

    q: dict[str, Callable[[str], Any]] = {}
    oracle_keys = set(analytics.ORACLE_SQL)
    for name in _DRIVER_PRIORITY:
        if name in analytics.QUERIES:
            q[name] = analytics.QUERIES[name]
    for name, fn in analytics.QUERIES.items():
        if name in oracle_keys and name not in q:
            q[name] = fn
    kg: dict[str, Callable[[str], Any]] = {
        "kg_docs": _q_kg_docs,
        "kg_mentions": _q_kg_mentions,
        "kg_triples": _q_kg_triples,
        "kg_entities": _q_kg_entities,
        "kg_edges": _q_kg_edges,
        "kg_top_entities": _q_kg_top_entities,
        "kg_entry_points": _q_kg_entry_points,
        "kg_skeleton": _q_kg_skeleton,
        "kg_khop": _q_kg_khop,
        "kg_find": _q_kg_find,
        "kg_workflows": _q_kg_workflows,
        "kg_doc_search": _q_kg_doc_search,
        "kg_doc_search_hybrid": _q_kg_doc_search_hybrid,
        "kg_domain_rollup": _q_kg_domain_rollup,
        "kg_external": _q_kg_external,
        "kg_mermaid": _q_kg_mermaid,
        "kg_skeleton_tree": _q_kg_skeleton_tree,
        "kg_pagerank": _q_kg_pagerank,
        "kg_components": _q_kg_components,
        "kg_triangles": _q_kg_triangles,
        "kg_betweenness": _q_kg_betweenness,
        "kg_kcore": _q_kg_kcore,
        "kg_communities": _q_kg_communities,
        "kg_centrality": _q_kg_centrality,
        "kg_pattern": _q_kg_pattern,
        "kg_trends": _q_kg_trends,
        "kg_walks": _q_kg_walks,
        "kg_scc": _q_kg_scc,
        "kg_strongest_path": _q_kg_strongest_path,
    }
    q.update(kg)
    for name, fn in analytics.QUERIES.items():
        if name not in q:
            q[name] = fn
    q.update(training_ops.QUERIES)
    return q


def oracle_sql() -> dict[str, str]:
    from blarify_ray.pipelines import analytics

    return dict(analytics.ORACLE_SQL)
