"""External-enrichment connector — the web-KG analog of the reference's
GitHub integration (``blarify/integrations/github_creator.py:37-130``):
records from an EXTERNAL system (commits/PRs there; change/review records
here) become integration-layer nodes plus ``MODIFIED_BY`` edges attached
to existing KG entities, resolved through the same alias dictionary the
build uses — enrichment never re-extracts anything.

Scale shape: the records stream through one stateless ``map_batches``
against a broadcast alias map (entity-scale, the same object the S2–S4
link stage reads); unmatched records are dropped exactly like unresolved
blame ranges in the reference (``github_creator.py:104-118``). Output is
bucket-partitioned parquet like every other stage, written through the
same atomic manifest protocol, so enrichment is resumable and idempotent
(re-running with the same records is a no-op rename).
"""

from __future__ import annotations

import os

import pyarrow as pa
import ray
import ray.data

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..ids import entity_id, hashed_id, id_bucket
from ..state.manifest import lineage_hash, run_stage
from ..text import normalize_surface

EXTERNAL_NODES = pa.schema(
    [
        ("entity_id", pa.string()),
        ("name", pa.string()),
        ("type", pa.string()),
        ("ext_id", pa.string()),
        ("ts", pa.int64()),
        ("bucket", pa.int32()),
    ]
)

EXTERNAL_EDGES = pa.schema(
    [
        ("src_id", pa.string()),  # the KG entity that was touched
        ("dst_id", pa.string()),  # the external record node
        ("pred", pa.string()),  # MODIFIED_BY (github_creator.py:69-77)
        ("ext_id", pa.string()),
        ("kind", pa.string()),
        ("title", pa.string()),
        ("ts", pa.int64()),
        # the record's SCOPE over the entity's mention-position space
        # (sentence index half-open range) — the line-range of a commit
        # in the reference's blame (``tools/get_blame_info.py``)
        ("span_start", pa.int32()),
        ("span_end", pa.int32()),
        ("bucket", pa.int32()),
    ]
)


def synth_external_records(n_records: int, n_pages: int) -> ray.data.Dataset:
    """Deterministic external change-record fixture (the commit/PR
    analog): record *i* targets an alias surface from the entity
    universe; every 7th-ish record carries an unknown surface that must
    NOT attach (the unmatched-blame drop case)."""
    from ..corpus import entity_universe

    ents = entity_universe(n_pages)
    rows: dict[str, list] = {
        k: []
        for k in (
            "ext_id", "kind", "ts", "title", "target_surface",
            "span_start", "span_end",
        )
    }
    for i in range(n_records):
        e = ents[(i * 13) % len(ents)]
        surf = e.aliases[i % len(e.aliases)]
        if i % 7 == 3:
            surf = f"zz unknown {i}"
        kind = "change" if i % 3 else "review"
        # the record's scope over sentence positions: changes are narrow,
        # reviews wide (the commit-hunk vs PR-scope analog)
        start = (i * 3) % 15
        width = 2 if kind == "change" else 8
        rows["ext_id"].append(f"ext-{i:06d}")
        rows["kind"].append(kind)
        rows["ts"].append(1_700_000_000 + i * 60)
        rows["title"].append(f"{kind} #{i}: {surf}")
        rows["target_surface"].append(surf)
        rows["span_start"].append(start)
        rows["span_end"].append(min(start + width, 20))
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            rows,
            schema=pa.schema(
                [
                    ("ext_id", pa.string()), ("kind", pa.string()),
                    ("ts", pa.int64()), ("title", pa.string()),
                    ("target_surface", pa.string()),
                    ("span_start", pa.int32()), ("span_end", pa.int32()),
                ]
            ),
        )
    )


def attach_external(
    out_dir: str,
    records: ray.data.Dataset,
    known_norm_to_name: dict[str, tuple[str, str]],
    cfg: PipelineConfig = DEFAULT_CONFIG,
    source_fingerprint: str = "external",
) -> str:
    """records → ``external`` stage dir (nodes/ + edges/ parquet).

    Resolution is the alias-dictionary step of the link stage: the
    normalized target surface must hit an unambiguous known alias, else
    the record is dropped (count recorded in the manifest metrics)."""
    known_ref = ray.put(known_norm_to_name)
    env = cfg.env
    nb = cfg.num_buckets

    def resolve_edges(t: pa.Table) -> pa.Table:
        from ..util import get_broadcast

        known = get_broadcast(known_ref)
        edges: dict[str, list] = {k: [] for k in EXTERNAL_EDGES.names}
        for ext, kind, ts, title, surf, sp0, sp1 in zip(
            t["ext_id"].to_pylist(), t["kind"].to_pylist(), t["ts"].to_pylist(),
            t["title"].to_pylist(), t["target_surface"].to_pylist(),
            t["span_start"].to_pylist(), t["span_end"].to_pylist(),
        ):
            hit = known.get(normalize_surface(surf))
            if hit is None:
                continue  # unmatched blame → dropped (github_creator.py:104-118)
            name, etype = hit
            kg_id = entity_id(env, etype, name)
            ext_node = hashed_id(f"{env.prefix}/external/{kind}/{ext}")
            edges["src_id"].append(kg_id)
            edges["dst_id"].append(ext_node)
            edges["pred"].append("MODIFIED_BY")
            edges["ext_id"].append(ext)
            edges["kind"].append(kind)
            edges["title"].append(title)
            edges["ts"].append(ts)
            edges["span_start"].append(sp0)
            edges["span_end"].append(sp1)
            edges["bucket"].append(id_bucket(kg_id, nb))
        return pa.Table.from_pydict(edges, schema=EXTERNAL_EDGES)

    def node_projection(t: pa.Table) -> pa.Table:
        # the external node row is a pure projection of its edge row
        import pyarrow.compute as pc

        return pa.Table.from_pydict(
            {
                "entity_id": t["dst_id"],
                "name": t["title"],
                "type": pc.utf8_upper(t["kind"]),
                "ext_id": t["ext_id"],
                "ts": t["ts"],
                "bucket": pa.array(
                    [id_bucket(d, nb) for d in t["dst_id"].to_pylist()], pa.int32()
                ),
            },
            schema=EXTERNAL_NODES,
        )

    lin = lineage_hash("external", source_fingerprint, env.prefix, nb)

    def produce(tmp: str) -> None:
        from ..state.manifest import read_stage

        os.makedirs(os.path.join(tmp, "nodes"), exist_ok=True)
        os.makedirs(os.path.join(tmp, "edges"), exist_ok=True)
        records.map_batches(resolve_edges, batch_format="pyarrow").write_parquet(
            os.path.join(tmp, "edges"), partition_cols=["bucket"]
        )
        read_stage(os.path.join(tmp, "edges")).map_batches(
            node_projection, batch_format="pyarrow"
        ).write_parquet(os.path.join(tmp, "nodes"), partition_cols=["bucket"])

    path, _ = run_stage(out_dir, "external", lin, produce)
    return path


def external_edges_view(path: str) -> ray.data.Dataset:
    """The enrichment edges joined for query surfaces: one row per
    (entity, external record) attachment."""
    from ..state.manifest import read_stage

    return read_stage(
        os.path.join(path, "edges"),
        columns=[
            "src_id", "dst_id", "pred", "ext_id", "kind", "title", "ts",
            "span_start", "span_end",
        ],
    )


def blame_info(
    paths: dict[str, str], eid: str, cfg: PipelineConfig = DEFAULT_CONFIG
) -> dict:
    """Per-entity change history + most-specific attribution — the
    ``tools/get_blame_info.py`` analog (who changed this entity, ordered,
    most-specific first):

    - ``history``: every MODIFIED_BY record attached to the entity,
      ordered newest-first (ties → narrowest span, then ext_id) — read
      from ONE bucket dir of the external edges (the point-lookup prune,
      same layout as ``node_detail``);
    - ``attribution``: each of the entity's mention positions attributed
      to the MOST SPECIFIC change record whose span contains it
      (``ops.joins.most_specific_join`` — the reference keeps the match
      with minimum specificity level, ``relationship_creator.py:320-378``),
      the blame-per-line view.

    Scale shape: history is a one-bucket read; the mention scan is
    column-pruned and filtered map-only (the entity's canonical name is
    a query-scale closure constant); the interval join co-partitions
    record intervals (query-scale here) with the entity's mention points.
    """
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..ops.joins import most_specific_join
    from ..pipelines.graph_queries import entity_row
    from ..state.manifest import read_stage

    out_dir = os.path.dirname(paths["entities"].rstrip(os.sep))
    ext_dir = os.path.join(out_dir, "external", "edges")
    ent = entity_row(paths, eid, cfg)
    if ent is None or not os.path.isdir(ext_dir):
        return {"entity": ent, "history": [], "attribution": []}

    b = id_bucket(eid, cfg.num_buckets)
    hist_rows: list[dict] = []
    bucket_dir = os.path.join(ext_dir, f"bucket={b}")
    if os.path.isdir(bucket_dir):
        for fn in sorted(os.listdir(bucket_dir)):
            if not fn.endswith(".parquet"):
                continue
            t = pq.read_table(os.path.join(bucket_dir, fn))
            hist_rows.extend(t.filter(pc.equal(t["src_id"], eid)).to_pylist())
    hist_rows.sort(
        key=lambda r: (-r["ts"], r["span_end"] - r["span_start"], r["ext_id"])
    )
    for r in hist_rows:
        r.pop("bucket", None)
    if not hist_rows:
        return {"entity": ent, "history": [], "attribution": []}

    # the entity's mention positions: resolved mentions carrying the
    # canonical (name, type), read from ONE bucket dir of the lazily
    # built mentions_by_entity hive index (never a corpus-scale scan)
    from ..pipelines.graph_queries import _rel_bucket, ensure_mentions_by_entity

    name, etype = ent["name"], ent["type"]
    idx_dir = ensure_mentions_by_entity(paths, cfg)
    pt_rows = {"entity_id": [], "url": [], "sent_id": []}
    # the mentions index buckets by the env-independent relative id
    b_men = _rel_bucket(etype, name, cfg.num_buckets)
    bdir = os.path.join(idx_dir, f"bucket={b_men}")
    if os.path.isdir(bdir):
        for fn in sorted(os.listdir(bdir)):
            if not fn.endswith(".parquet"):
                continue
            t = pq.read_table(
                os.path.join(bdir, fn), columns=["url", "sent_id", "key", "etype"]
            )
            m = t.filter(
                pc.and_(pc.equal(t["key"], name), pc.equal(t["etype"], etype))
            )
            pt_rows["entity_id"].extend([eid] * m.num_rows)
            pt_rows["url"].extend(m["url"].to_pylist())
            pt_rows["sent_id"].extend(int(x) for x in m["sent_id"].to_pylist())
    points = ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "entity_id": pa.array(pt_rows["entity_id"], pa.string()),
                "url": pa.array(pt_rows["url"], pa.string()),
                "sent_id": pa.array(pt_rows["sent_id"], pa.int64()),
            }
        )
    )
    intervals = ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "entity_id": pa.array([eid] * len(hist_rows), pa.string()),
                "span_start": pa.array(
                    [int(r["span_start"]) for r in hist_rows], pa.int64()
                ),
                "span_end": pa.array(
                    [int(r["span_end"]) for r in hist_rows], pa.int64()
                ),
                "ext_id": pa.array([r["ext_id"] for r in hist_rows], pa.string()),
                "kind": pa.array([r["kind"] for r in hist_rows], pa.string()),
                "ts": pa.array([r["ts"] for r in hist_rows], pa.int64()),
            }
        )
    )
    attributed = most_specific_join(
        points, intervals, key="entity_id", point_col="sent_id",
        start_col="span_start", end_col="span_end",
        payload_cols=["ext_id", "kind", "ts"], tie_cols=["ext_id"],
    ).take_all()
    attributed = [
        {
            "url": r["url"], "sent_id": r["sent_id"],
            "ext_id": r["ext_id"], "kind": r["kind"], "ts": r["ts"],
        }
        for r in attributed
        if r.get("ext_id") is not None
    ]
    attributed.sort(key=lambda r: (r["url"], r["sent_id"], r["ext_id"]))
    return {"entity": ent, "history": hist_rows, "attribution": attributed}
