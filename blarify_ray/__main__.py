"""CLI entrypoint — the ``blarify create`` analog
(``blarify/cli/main.py:10-51``, ``cli/commands/create.py:237-289``),
submittable via ``ray job submit -- python -m blarify_ray build ...``.

This is the ONLY module in the package that may call ``ray.init`` (and
only when no session exists).
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="blarify_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="run the full KG-construction pipeline")
    b.add_argument("--out", required=True, help="output/checkpoint directory")
    b.add_argument(
        "--pages", type=int, required=True,
        help="corpus size: drives the gazetteer/entity universe — with "
             "--warc-dir it must match the archive's generating corpus "
             "size",
    )
    b.add_argument(
        "--warc-dir", default=None,
        help="ingest pages from a WARC shard directory instead of the "
             "synthetic source (sources/warc.py)",
    )
    b.add_argument("--num-cpus", type=int, default=None)

    u = sub.add_parser("update", help="incremental update for changed pages")
    u.add_argument("--out", required=True)
    u.add_argument("--pages", type=int, required=True)
    u.add_argument("--indices", required=True, help="comma-separated page indices")
    u.add_argument(
        "--content-seed", type=int, default=None,
        help="simulate changed page content (None = identical re-fetch)",
    )
    u.add_argument("--num-cpus", type=int, default=None)

    q = sub.add_parser("query", help="run a KG query against a built graph")
    q.add_argument("--out", required=True)
    q.add_argument(
        "--name", required=True,
        choices=["top", "entry-points", "skeleton", "rollup", "pagerank", "components", "communities", "betweenness"],
    )
    q.add_argument("--num-cpus", type=int, default=None)

    t = sub.add_parser("tools", help="list or call agent tools over a built graph")
    t.add_argument("--out", required=True)
    t.add_argument("--call", default=None, help="tool name (omit to list the registry)")
    t.add_argument("--args", default="{}", help="JSON arguments for --call")
    t.add_argument("--num-cpus", type=int, default=None)

    m = sub.add_parser("serve-mcp", help="MCP-style JSON-RPC loop over stdio")
    m.add_argument("--out", required=True)
    m.add_argument("--num-cpus", type=int, default=None)

    e = sub.add_parser(
        "export-shards",
        help="materialize the global-shuffle training-shard layout "
             "(resumable: reruns skip on an unchanged input fingerprint)",
    )
    e.add_argument("--sf-dir", required=True, help="directory holding documents.parquet")
    e.add_argument("--out", required=True, help="shard layout output directory")
    e.add_argument("--force", action="store_true", help="rewrite even if the marker matches")
    e.add_argument("--num-cpus", type=int, default=None)

    d = sub.add_parser("diff", help="ADDED/DELETED/MODIFIED between two built graphs")
    d.add_argument("--old", required=True, help="older build's output directory")
    d.add_argument("--new", required=True, help="newer build's output directory")
    d.add_argument(
        "--relative", action="store_true",
        help="join on env-independent relative ids (cross-environment diff)",
    )
    d.add_argument("--num-cpus", type=int, default=None)

    args = p.parse_args(argv)

    import ray

    if not ray.is_initialized():
        kw = {"address": "local", "include_dashboard": False, "logging_level": "ERROR"}
        if args.num_cpus:
            kw["num_cpus"] = args.num_cpus
        ray.init(**kw)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    from .util import tune_data_context

    tune_data_context()

    try:
        if args.cmd == "build":
            from .pipelines.kg_build import build_kg

            if args.warc_dir:
                from .sources.warc import archive_fingerprint, read_pages_warc

                # CONTENT-based lineage: editing the archive invalidates
                # the checkpoints (a path-keyed fingerprint would reuse
                # stale stages after a re-export)
                fp = archive_fingerprint(args.warc_dir)
                paths = build_kg(
                    args.out, args.pages, pages=read_pages_warc(args.warc_dir),
                    source_fingerprint=f"warc:{fp}:{args.pages}",
                )
            else:
                paths = build_kg(args.out, args.pages)
            print(json.dumps({"status": "ok", "stages": paths}))
        elif args.cmd == "update":
            from .pipelines.incremental import incremental_update

            idx = [int(x) for x in args.indices.split(",") if x]
            paths = incremental_update(
                args.out, args.pages, idx, content_seed=args.content_seed
            )
            print(json.dumps({"status": "ok", "stages": paths}))
        elif args.cmd == "export-shards":
            from .pipelines.analytics_export import write_training_shards

            meta = write_training_shards(args.sf_dir, args.out, force=args.force)
            print(json.dumps({"status": "ok", **meta}))
        elif args.cmd == "diff":
            from .pipelines.graph_diff import entity_diff

            po = {"entities": f"{args.old}/entities"}
            pn = {"entities": f"{args.new}/entities"}
            for r in entity_diff(po, pn, relative=args.relative).take_all():
                print(json.dumps(r, default=str))
        elif args.cmd in ("tools", "serve-mcp"):
            from . import tools as toolmod

            paths = {
                k: f"{args.out}/{k}"
                for k in ("docs", "mentions", "canonical", "entities", "edges")
            }
            if args.cmd == "serve-mcp":
                toolmod.serve_mcp_stdio(paths)
            elif args.call:
                out = toolmod.call_tool(paths, args.call, json.loads(args.args))
                print(json.dumps(out, default=str))
            else:
                print(json.dumps(toolmod.list_tools(), indent=1))
        else:
            from .pipelines import graph_queries as gq
            from .pipelines.hierarchy import bottom_up_rollup

            paths = {
                k: f"{args.out}/{k}"
                for k in ("docs", "mentions", "canonical", "entities", "edges")
            }
            if args.name == "top":
                rows = gq.top_entities(paths, k=10).take_all()
            elif args.name == "entry-points":
                rows = gq.entry_points(paths).take_all()
            elif args.name == "skeleton":
                rows = gq.skeleton(paths).take_all()
            elif args.name == "pagerank":
                from .pipelines.graph_analytics import top_pagerank

                rows = top_pagerank(paths, k=10).take_all()
            elif args.name == "components":
                from .pipelines.graph_analytics import component_sizes

                rows = component_sizes(paths, k=10).take_all()
            elif args.name == "communities":
                from .pipelines.graph_analytics import top_communities

                rows = top_communities(paths, k=10).take_all()
            elif args.name == "betweenness":
                from .pipelines.graph_analytics import top_betweenness

                rows = top_betweenness(paths, k=10).to_dict(orient="records")
            else:
                rows = bottom_up_rollup(paths).take_all()
            for r in rows:
                print(json.dumps(r, default=str))
    finally:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
