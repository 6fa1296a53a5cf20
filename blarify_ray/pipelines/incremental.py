"""Incremental update — re-run the pipeline over a changed page subset.

Analog of ``GraphBuilder.incremental_update``
(``blarify/prebuilt/graph_builder.py:138-225``): delete stale rows for
the updated urls, rebuild only those pages through the expensive
extract/NER stages, then refresh the derived aggregate stages.

The corpus-scale stages (docs, mentions) are updated as
filter-out + union-delta; only the delta pages pass through extraction
and NER. The entity-scale aggregate stages (canonical, entities, edges)
recompute from the merged mentions — their cost is a scan + small
shuffles, not NER. At 100 TB the filter-out+union becomes a per-bucket
partition replace (docs/mentions hash-partitioned by url); the stage
manifests already carry the lineage chain that invalidates exactly the
downstream stages.
"""

from __future__ import annotations

import pyarrow as pa
import ray
import ray.data

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..corpus import entity_universe, gen_page_rows, page_url
from ..schemas import PAGES
from ..stages.extract import extract_and_dedup
from ..stages.mentions import detect_and_link
from ..state.manifest import lineage_hash, read_manifest, read_stage, run_stage


def incremental_update(
    out_dir: str,
    n_pages: int,
    updated_indices: list[int],
    cfg: PipelineConfig = DEFAULT_CONFIG,
    content_seed: int | None = None,
) -> dict[str, str]:
    """Refresh the KG under ``out_dir`` after the given logical pages
    changed (their latest crawl re-fetched). ``content_seed`` simulates
    changed page content (new crawl); None re-fetches identical content.
    Returns stage paths."""
    from .kg_build import build_kg  # shared downstream stages

    updated_indices = sorted(set(updated_indices))
    updated_urls = {page_url(i) for i in updated_indices}
    urls_ref = ray.put(updated_urls)

    old_docs_man = read_manifest(out_dir, "docs")
    assert old_docs_man is not None, "incremental_update requires a prior build"
    docs_lin = lineage_hash("docs-incr", old_docs_man["lineage"], tuple(updated_indices), content_seed)

    def produce_docs(tmp: str) -> None:
        rows: list[dict] = []
        for i in updated_indices:
            kw = {"max_html_bytes": cfg.max_html_bytes}
            if content_seed is not None:
                kw["seed"] = content_seed
            rows.extend(gen_page_rows(i, n_pages, **kw))
        delta_pages = ray.data.from_arrow(pa.Table.from_pylist(rows, schema=PAGES))
        docs_delta = extract_and_dedup(delta_pages, cfg)

        def drop_updated(t: pa.Table) -> pa.Table:
            urls = ray.get(urls_ref)
            mask = pa.array([u not in urls for u in t["url"].to_pylist()])
            return t.filter(mask)

        kept = read_stage(f"{out_dir}/docs").map_batches(drop_updated, batch_format="pyarrow")
        kept.union(docs_delta).write_parquet(tmp)

    docs_path, _ = run_stage(out_dir, "docs", docs_lin, produce_docs)

    old_men_man = read_manifest(out_dir, "mentions")
    men_lin = lineage_hash("mentions-incr", docs_lin, old_men_man["lineage"] if old_men_man else "")

    def produce_mentions(tmp: str) -> None:
        entities = entity_universe(n_pages)
        ents_ref = ray.put(entities)

        def only_updated(t: pa.Table) -> pa.Table:
            urls = ray.get(urls_ref)
            mask = pa.array([u in urls for u in t["url"].to_pylist()])
            return t.filter(mask)

        def drop_updated(t: pa.Table) -> pa.Table:
            urls = ray.get(urls_ref)
            mask = pa.array([u not in urls for u in t["url"].to_pylist()])
            return t.filter(mask)

        delta_docs = read_stage(docs_path, columns=["url", "text", "raw", "lang"]).map_batches(
            only_updated, batch_format="pyarrow"
        )
        delta_mentions = detect_and_link(delta_docs, ents_ref, cfg)
        kept = read_stage(f"{out_dir}/mentions").map_batches(drop_updated, batch_format="pyarrow")
        kept.union(delta_mentions).write_parquet(tmp)

    run_stage(out_dir, "mentions", men_lin, produce_mentions)

    # Downstream aggregate stages: build_kg sees matching docs/mentions
    # manifests (skips them) but fresh lineage is needed for canonical /
    # entities / edges — bump via the chained lineage inputs by calling
    # the shared builder with the incremental lineage baked into the
    # source fingerprint.
    return build_kg(
        out_dir, n_pages, cfg,
        source_fingerprint=docs_lin,
        _upstream_lineages={"docs": docs_lin, "mentions": men_lin},
    )
