"""S5 — distributed canonicalization: MinHash-LSH blocking + union-find
connected components, as Ray Data shuffles.

Must reproduce ``blarify_ray.canonical.canonicalize_surfaces`` (the
serial spec) exactly; tests compare the two mappings. Pipeline:

1. distinct unresolved surface norms (vectorized projection + groupby);
2. union with the known unambiguous alias norms (small driver-side
   table — at real scale a parquet dimension table);
3. ``flat_map`` each norm to its 32 LSH (band_id, band_hash) rows;
4. ``groupby(band)`` → per-bucket verified pairs (unk×known, unk×unk;
   known×known never enumerated — the duplicate_names guarantee);
5. unk→known attachments: per-unk argmax Jaccard (groupby);
6. unk–unk pairs → iterative min-label propagation over
   ``Dataset.join`` (hash-partitioned) until fixpoint — distributed
   union-find; labels are the norms themselves, so a component's label
   converges to its lexicographically smallest member. Round cap =
   ``cfg.cc_max_rounds`` mirrors the reference's stuck-round guard
   (``bottom_up_batch_processor.py:184-246``);
7. per-component best attachment (argmax again) → canonical map
   ``(norm, name, etype, is_new)``.

Every intermediate here is entity-scale (distinct surfaces), orders of
magnitude smaller than the page corpus; the expensive corpus-scale scan
happened once in S2–S4.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..minhash import band_hashes_batch, make_perms, signatures_batch


def distinct_unk_norms(mentions_resolved: ray.data.Dataset) -> ray.data.Dataset:
    """Distinct normalized surfaces of unresolved mentions → ds[norm].
    Partial distinct per batch first (a batch's unks collapse to a tiny
    set) so the global distinct shuffle moves entity-scale rows, not
    mention-scale rows."""

    def local_distinct(t: pa.Table) -> pa.Table:
        t = t.filter(pc.invert(t["resolved"]))
        uniq = sorted(set(t["key"].to_pylist()))
        return pa.Table.from_pydict({"norm": pa.array(uniq, pa.string())})

    return (
        mentions_resolved.map_batches(local_distinct, batch_format="pyarrow", batch_size=8192)
        .groupby("norm")
        .count()
        .select_columns(["norm"])
    )


def _band_rows(t: pa.Table, cfg: PipelineConfig, perms) -> pa.Table:
    import numpy as np

    a, b = perms
    norms, knowns = t["norm"].to_pylist(), t["is_known"].to_pylist()
    # batch-vectorized signatures + banding: one numpy pass per batch,
    # bit-identical to the serial per-key spec
    sigs = signatures_batch(norms, cfg.shingle_k, a, b)
    bands = band_hashes_batch(sigs, cfg.lsh_bands)  # (n, n_bands)
    n, nb = bands.shape
    bh_flat = bands.reshape(-1)
    band_ids = np.tile(np.arange(nb, dtype=np.int64), n)
    rep = np.repeat(np.arange(n), nb)
    return pa.Table.from_pydict(
        {
            # pkey routes WHOLE buckets to Ray-level partitions: the
            # shuffle groups ~agg_partitions partitions, not one Ray
            # group per LSH bucket (500k tiny map_groups calls → ~64).
            "pkey": pa.array((bh_flat % np.uint64(cfg.agg_partitions)).astype(np.int64)),
            "band_id": pa.array(band_ids),
            "band_hash": pa.array(bh_flat),
            "norm": pa.array([norms[i] for i in rep], pa.string()),
            "is_known": pa.array([bool(knowns[i]) for i in rep]),
        }
    )


def _partition_pairs(group: pa.Table, cfg: PipelineConfig) -> pa.Table:
    """Verified pairs for every LSH bucket routed to this partition;
    ≥1 unk side; x<y. Buckets are reconstructed locally with a dict —
    same pairs as per-bucket processing, two orders of magnitude fewer
    Ray-level groups."""
    from ..canonical import pair_scorer

    out = {"x": [], "y": [], "j": [], "x_known": [], "y_known": []}
    buckets: dict[tuple[int, int], list[tuple[str, bool]]] = {}
    part_norms: set[str] = set()
    for band_id, bh, norm, k in zip(
        group["band_id"].to_pylist(), group["band_hash"].to_pylist(),
        group["norm"].to_pylist(), group["is_known"].to_pylist(),
    ):
        buckets.setdefault((band_id, bh), []).append((norm, k))
        part_norms.add(norm)
    # same scorer as the serial spec (ResolverMode-aware)
    score, threshold = pair_scorer(sorted(part_norms), cfg)
    seen: set[tuple[str, str]] = set()

    for members0 in buckets.values():
        if len(members0) < 2 or len(members0) > cfg.max_lsh_bucket:
            continue
        members = sorted(set(members0))
        unks = [m for m, k in members if not k]
        if not unks:
            continue
        known_of = dict(members)
        for u in unks:
            for v, _vk in members:
                if v == u:
                    continue
                x, y = (u, v) if u < v else (v, u)
                if (x, y) in seen:
                    continue
                seen.add((x, y))
                j = score(x, y)
                if j >= threshold:
                    out["x"].append(x)
                    out["y"].append(y)
                    out["j"].append(j)
                    out["x_known"].append(known_of[x])
                    out["y_known"].append(known_of[y])
    return pa.Table.from_pydict(
        out,
        schema=pa.schema(
            [("x", pa.string()), ("y", pa.string()), ("j", pa.float64()),
             ("x_known", pa.bool_()), ("y_known", pa.bool_())]
        ),
    )


def _dedup_pairs(t: pa.Table) -> pa.Table:
    """A pair can surface from several bands — keep one copy."""
    import pandas as pd  # noqa: F401

    df = t.to_pandas().drop_duplicates(subset=["x", "y"])
    return pa.Table.from_pandas(df, preserve_index=False)


def connected_components(pairs: ray.data.Dataset, cfg: PipelineConfig) -> dict[str, str]:
    """Min-label propagation → {node: component_label}.

    Labels are the node strings, so the fixpoint label of a component is
    its lexicographically smallest member (exactly the serial
    new-entity naming rule). Each round is a distributed
    ``map_batches`` + ``groupby(node).min(comp)`` shuffle over the edge
    dataset; only the current label map is broadcast (``ray.put``) —
    it is entity-scale (distinct unresolved surfaces in candidate
    pairs), orders of magnitude below corpus scale. Should it ever
    outgrow the driver, the propagation becomes a hash-partitioned
    ``Dataset.join`` on the same loop shape (Ray 2.49's join currently
    faults on empty hash partitions, hence the broadcast formulation).
    """
    if pairs.count() == 0:
        return {}

    def sym(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "src": pa.concat_arrays([t["x"].combine_chunks(), t["y"].combine_chunks()]),
                "dst": pa.concat_arrays([t["y"].combine_chunks(), t["x"].combine_chunks()]),
            }
        )

    edges = pairs.map_batches(sym, batch_format="pyarrow").materialize()
    labels: dict[str, str] = {
        r["src"]: r["src"] for r in edges.groupby("src").count().select_columns(["src"]).take_all()
    }
    for _round in range(cfg.cc_max_rounds):
        ref = ray.put(labels)

        def prop(t: pa.Table, _ref=ref) -> pa.Table:
            lm = ray.get(_ref)
            comp = [lm.get(s, s) for s in t["src"].to_pylist()]
            return pa.Table.from_pydict(
                {"node": t["dst"], "comp": pa.array(comp, pa.string())}
            )

        self_rows = pa.Table.from_pydict(
            {"node": list(labels), "comp": [labels[k] for k in labels]}
        )
        msgs = edges.map_batches(prop, batch_format="pyarrow").union(
            ray.data.from_arrow(self_rows)
        )
        new_rows = msgs.groupby("node").min("comp").take_all()
        new_labels = {r["node"]: r["min(comp)"] for r in new_rows}
        if new_labels == labels:
            return labels
        labels = new_labels
    # Round cap hit without a fixpoint (component diameter > cc_max_rounds):
    # returning partial labels would silently diverge from the union-find
    # spec, so finish exactly on the driver — the label map is already
    # driver-resident, so a driver union-find over the edges costs no more
    # memory than the loop itself.
    from ..canonical import UnionFind

    uf = UnionFind()
    for r in edges.take_all():
        uf.union(r["src"], r["dst"])
    return {x: uf.find(x) for x in labels}


def build_canonical_map(
    mentions_resolved: ray.data.Dataset,
    known_norm_to_name: dict[str, tuple[str, str]],
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> pa.Table:
    """→ small Arrow table (norm, name, etype, is_new) for every distinct
    unresolved surface norm. Materialized (entity-scale, not page-scale);
    the driver broadcasts it to the resolve stages via ``ray.put``.

    Size-tiered execution: the corpus-scale work (distinct unresolved
    norms) always runs distributed; when the resulting DISTINCT norm set
    is small (≤ ``cfg.canon_driver_max_norms``) the LSH/verify/cluster
    phase runs on the driver via the serial spec
    (``canonical.canonicalize_surfaces`` — identical output by
    definition), skipping 3+ entity-scale shuffle executions whose fixed
    orchestration latency otherwise dominates the stage. Above the
    threshold the fully distributed path below takes over."""
    # ONE corpus-scale scan produces the distinct norm set; both tiers
    # reuse it (the tier probe must not pay a second scan)
    distinct = distinct_unk_norms(mentions_resolved).materialize()
    n_norms = distinct.count()
    if cfg.canon_driver_max_norms > 0 and n_norms <= cfg.canon_driver_max_norms:
        from ..canonical import canonicalize_surfaces

        norms = {r["norm"] for r in distinct.take_all()}
        canon = canonicalize_surfaces(norms, known_norm_to_name, cfg)
        out = {"norm": [], "name": [], "etype": [], "is_new": []}
        for n in sorted(canon):
            nm, t, new = canon[n]
            out["norm"].append(n)
            out["name"].append(nm)
            out["etype"].append(t)
            out["is_new"].append(new)
        return pa.Table.from_pydict(
            out,
            schema=pa.schema(
                [("norm", pa.string()), ("name", pa.string()),
                 ("etype", pa.string()), ("is_new", pa.bool_())]
            ),
        )

    unks = distinct.map_batches(
        lambda t: t.append_column("is_known", pa.array([False] * t.num_rows)),
        batch_format="pyarrow",
    ).materialize()  # reused for band generation AND the final unk list
    known_tbl = pa.Table.from_pydict(
        {
            "norm": list(known_norm_to_name),
            "is_known": [True] * len(known_norm_to_name),
        }
    )
    nodes = unks.union(ray.data.from_arrow(known_tbl))

    perms = make_perms(cfg.minhash_perms)
    bands = nodes.map_batches(
        lambda t: _band_rows(t, cfg, perms), batch_format="pyarrow", batch_size=2048
    )
    pairs = (
        bands.groupby("pkey")
        .map_groups(lambda g: _partition_pairs(g, cfg), batch_format="pyarrow")
        .map_batches(_dedup_pairs, batch_format="pyarrow")
        .materialize()
    )
    # cross-partition duplicate pairs are possible — harmless: argmax and
    # union-find are idempotent over duplicates.

    # The verified pair set is entity-scale by construction (distinct
    # surfaces, not corpus rows) — pull it to the driver ONCE and do the
    # argmax attachment + union-find in-process; fall back to the
    # distributed min-label loop only when it is genuinely large.
    n_pairs = pairs.count()
    att_map: dict[str, tuple[float, str]] = {}
    comp_map: dict[str, str] = {}
    if n_pairs == 0:
        pass
    elif n_pairs <= cfg.cc_driver_max_pairs:
        import numpy as np

        # cross-partition duplicates (same pair via bands routed to
        # different partitions) can multiply the row count several-fold —
        # one vectorized dedup beats feeding them all to the union-find
        pdf = pairs.to_pandas().drop_duplicates(["x", "y"])
        xk = pdf["x_known"].to_numpy()
        yk = pdf["y_known"].to_numpy()
        # unk→known attachments, vectorized: sort by (unk, -j, known) and
        # keep the first row per unk = argmax j with min-known tie-break
        att = pdf[xk ^ yk].copy()
        if len(att):
            att["unk"] = np.where(att["x_known"], att["y"], att["x"])
            att["known"] = np.where(att["x_known"], att["x"], att["y"])
            att = att.sort_values(
                ["unk", "j", "known"], ascending=[True, False, True], kind="mergesort"
            ).drop_duplicates("unk")
            att_map = {u: (j, k) for u, j, k in zip(att["unk"], att["j"], att["known"])}
        from ..canonical import UnionFind

        uf = UnionFind()
        uu = pdf[~xk & ~yk]
        for x, y in zip(uu["x"], uu["y"]):
            uf.union(x, y)
        comp_map = {k: uf.find(k) for k in list(uf.parent)}
    else:

        def att_rows(t: pa.Table) -> pa.Table:
            mask = pc.xor(t["x_known"], t["y_known"])
            t = t.filter(mask)
            unk = pc.if_else(t["x_known"], t["y"], t["x"])
            kn = pc.if_else(t["x_known"], t["x"], t["y"])
            return pa.Table.from_pydict({"unk": unk, "known": kn, "j": t["j"]})

        for r in pairs.map_batches(att_rows, batch_format="pyarrow").take_all():
            cur = att_map.get(r["unk"])
            cand = (r["j"], r["known"])
            if cur is None or (cand[0], _rev(cand[1])) > (cur[0], _rev(cur[1])):
                att_map[r["unk"]] = cand
        uu = pairs.map_batches(
            lambda t: t.filter(pc.invert(pc.or_(t["x_known"], t["y_known"]))),
            batch_format="pyarrow",
        ).materialize()
        comp_map = connected_components(uu, cfg)

    # Assemble on the driver — every table here is entity-scale.
    unk_list = [r["norm"] for r in unks.select_columns(["norm"]).take_all()]

    # per-component best attachment
    comp_best: dict[str, tuple[float, str]] = {}
    for u in unk_list:
        c = comp_map.get(u, u)
        a = att_map.get(u)
        if a is not None:
            cur = comp_best.get(c)
            if cur is None or (a[0], _rev(a[1])) > (cur[0], _rev(cur[1])):
                comp_best[c] = a
    out = {"norm": [], "name": [], "etype": [], "is_new": []}
    for u in sorted(unk_list):
        c = comp_map.get(u, u)
        b = comp_best.get(c)
        if b is not None:
            name, etype = known_norm_to_name[b[1]]
            out["norm"].append(u)
            out["name"].append(name)
            out["etype"].append(etype)
            out["is_new"].append(False)
        else:
            out["norm"].append(u)
            out["name"].append(c)  # min member = component label
            out["etype"].append("UNK")
            out["is_new"].append(True)
    return pa.Table.from_pydict(
        out,
        schema=pa.schema(
            [("norm", pa.string()), ("name", pa.string()),
             ("etype", pa.string()), ("is_new", pa.bool_())]
        ),
    )


class _rev:
    """Reversed string ordering so (max j, min lexicographic) composes as
    one max()."""

    __slots__ = ("s",)

    def __init__(self, s: str):
        self.s = s

    def __lt__(self, other: "_rev") -> bool:
        return self.s > other.s

    def __gt__(self, other: "_rev") -> bool:
        return self.s < other.s

    def __eq__(self, other: object) -> bool:
        return isinstance(other, _rev) and self.s == other.s
