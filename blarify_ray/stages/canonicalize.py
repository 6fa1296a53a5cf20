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
6. unk–unk pairs → iterative min-label propagation with pointer
   jumping over hash-partitioned label datasets until fixpoint —
   distributed union-find; labels are the norms themselves, so a
   component's label converges to its lexicographically smallest
   member (convergence-guard loop shape mirrors the reference's
   stuck-round handling, ``bottom_up_batch_processor.py:184-246``);
7. per-component best attachment (argmax again) → canonical map
   ``(norm, name, etype, is_new)``.

Every intermediate here is entity-scale (distinct surfaces), orders of
magnitude smaller than the page corpus; the expensive corpus-scale scan
happened once in S2–S4.
"""

from __future__ import annotations

import numpy as np
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
        keys = t.filter(pc.invert(t["resolved"]))["key"]
        return pa.Table.from_pydict(
            {"norm": pc.unique(pc.cast(keys, pa.string()))}
        )

    return (
        mentions_resolved.map_batches(local_distinct, batch_format="pyarrow", batch_size=8192)
        .groupby("norm")
        .count()
        .select_columns(["norm"])
    )


def _band_rows_idx(t: pa.Table, cfg: PipelineConfig, perms, norms_ref) -> pa.Table:
    """LSH band rows for a batch of key INDICES (``id`` from
    ``ray.data.range``): the exchange carries only fixed-width ints —
    (pkey, band_id, band_hash, idx) — never the norm strings, which every
    worker reads once from the broadcast sorted key list. ~3× fewer
    shuffle bytes than string rows and no per-row Python."""
    import numpy as np

    from ..util import get_broadcast

    a, b = perms
    keys = get_broadcast(norms_ref)
    ids = t["id"].to_numpy()
    norms = [keys[i] for i in ids]
    # batch-vectorized signatures + banding: one numpy pass per batch,
    # bit-identical to the serial per-key spec
    sigs = signatures_batch(norms, cfg.shingle_k, a, b)
    bands = band_hashes_batch(sigs, cfg.lsh_bands)  # (n, n_bands)
    n, nb = bands.shape
    bh_flat = bands.reshape(-1)
    band_ids = np.tile(np.arange(nb, dtype=np.int64), n)
    return pa.Table.from_pydict(
        {
            # pkey routes WHOLE buckets to Ray-level partitions: the
            # shuffle groups ~agg_partitions partitions, not one Ray
            # group per LSH bucket (500k tiny map_groups calls → ~64).
            "pkey": pa.array((bh_flat % np.uint64(cfg.agg_partitions)).astype(np.int64)),
            "band_id": pa.array(band_ids),
            "band_hash": pa.array(bh_flat.view(np.int64)),
            "idx": pa.array(np.repeat(ids, nb).astype(np.int32)),
        }
    )


def _idx_scorer(keys: list[str], cfg: PipelineConfig):
    """(score(xi, yi), threshold) over indices into the sorted key list,
    with LAZY per-key feature memoization — a partition only pays for the
    keys it actually scores. Kernels and rounding identical to the serial
    ``canonical.pair_scorer``."""
    from ..config import ResolverMode

    if cfg.resolver_mode == ResolverMode.EMBEDDING:
        from ..text import embed_cosine, shingle_embed

        emb: dict[int, object] = {}

        def escore(xi: int, yi: int) -> float:
            ex = emb.get(xi)
            if ex is None:
                ex = emb[xi] = shingle_embed(keys[xi], cfg.shingle_k)
            ey = emb.get(yi)
            if ey is None:
                ey = emb[yi] = shingle_embed(keys[yi], cfg.shingle_k)
            return round(embed_cosine(ex, ey), 9)

        return escore, cfg.embed_link_threshold

    if cfg.resolver_mode == ResolverMode.AUTO:
        from ..text import char_shingles, embed_cosine, jaccard, shingle_embed

        sha: dict[int, object] = {}
        aemb: dict[int, object] = {}

        def ashingles(i: int):
            s = sha.get(i)
            if s is None:
                s = sha[i] = char_shingles(keys[i], cfg.shingle_k)
            return s

        def aembed(i: int):
            e = aemb.get(i)
            if e is None:
                e = aemb[i] = shingle_embed(keys[i], cfg.shingle_k)
            return e

        def ascore(xi: int, yi: int) -> float:
            # dictionary (Jaccard) first; accepted pairs score 1+j so
            # they strictly outrank every cosine-fallback pair (≤ 1) —
            # kernels and rounding identical to canonical.pair_scorer
            j = jaccard(ashingles(xi), ashingles(yi))
            if j >= cfg.jaccard_threshold:
                return 1.0 + j
            return round(embed_cosine(aembed(xi), aembed(yi)), 9)

        return ascore, cfg.embed_link_threshold

    from ..text import char_shingles, jaccard

    sh: dict[int, object] = {}

    def jscore(xi: int, yi: int) -> float:
        sx = sh.get(xi)
        if sx is None:
            sx = sh[xi] = char_shingles(keys[xi], cfg.shingle_k)
        sy = sh.get(yi)
        if sy is None:
            sy = sh[yi] = char_shingles(keys[yi], cfg.shingle_k)
        return jaccard(sx, sy)

    return jscore, cfg.jaccard_threshold


def _partition_pairs_idx(
    group: pa.Table, cfg: PipelineConfig, norms_ref, unk_ref
) -> pa.Table:
    """Verified pairs (as index pairs) for every LSH bucket routed to
    this partition; ≥1 unk side; x<y. The key list is sorted, so index
    order IS lexicographic order — bucket reconstruction and pair
    enumeration run on numpy int arrays; strings are touched only inside
    the lazy scorer."""
    import numpy as np

    from ..util import get_broadcast

    keys = get_broadcast(norms_ref)
    is_unk = get_broadcast(unk_ref)  # numpy bool array aligned with keys
    bh = group["band_hash"].to_numpy()
    bid = group["band_id"].to_numpy()
    idxs = group["idx"].to_numpy()
    order = np.lexsort((idxs, bid, bh))
    bh, bid, idxs = bh[order], bid[order], idxs[order]
    # bucket boundaries where (band_hash, band_id) changes
    if len(bh) == 0:
        starts = np.array([], dtype=np.int64)
    else:
        change = np.flatnonzero((bh[1:] != bh[:-1]) | (bid[1:] != bid[:-1])) + 1
        starts = np.concatenate(([0], change, [len(bh)]))
    score, threshold = _idx_scorer(keys, cfg)
    seen: set[int] = set()
    n_keys = len(keys)
    xs: list[int] = []
    ys: list[int] = []
    js: list[float] = []
    for si in range(len(starts) - 1):
        m = idxs[starts[si] : starts[si + 1]]
        if m.size < 2 or m.size > cfg.max_lsh_bucket:
            continue
        unks = m[is_unk[m]]
        if unks.size == 0:
            continue
        for u in unks:
            for v in m:
                if v == u:
                    continue
                x, y = (u, v) if u < v else (v, u)
                packed = int(x) * n_keys + int(y)
                if packed in seen:
                    continue
                seen.add(packed)
                j = score(int(x), int(y))
                if j >= threshold:
                    xs.append(int(x))
                    ys.append(int(y))
                    js.append(j)
    return pa.Table.from_pydict(
        {"x": xs, "y": ys, "j": js},
        schema=pa.schema(
            [("x", pa.int32()), ("y", pa.int32()), ("j", pa.float64())]
        ),
    )


def min_label_components(ex, ey):
    """Connected components over integer edge endpoints: vectorized
    min-label propagation with pointer jumping — O(log diameter) numpy
    sweeps instead of a Python union-find loop over millions of edges.
    Returns (nodes, lab): the sorted distinct node ids and, per node,
    the index INTO ``nodes`` of its component's minimum member. With the
    caller's ids in sorted-key order, the minimum member is the
    lexicographically smallest — exactly the serial UnionFind's
    smaller-string-becomes-root rule (canonical.py:43-50)."""
    import numpy as np

    nodes = np.unique(np.concatenate([ex, ey]))
    cx = np.searchsorted(nodes, ex)
    cy = np.searchsorted(nodes, ey)
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        new = lab.copy()
        np.minimum.at(new, cx, lab[cy])
        np.minimum.at(new, cy, lab[cx])
        new = new[new]  # pointer jumping
        if np.array_equal(new, lab):
            return nodes, lab
        lab = new


def connected_components_ds(
    pairs: ray.data.Dataset, cfg: PipelineConfig
) -> ray.data.Dataset:
    """Fully distributed min-label propagation over ``(x, y)`` edge
    columns of ANY comparable dtype (string surface norms, int64 doc
    ids) → ``Dataset[(node, comp)]`` where ``comp`` is the component's
    minimum member — the serial UnionFind's smaller-label-becomes-root
    rule (canonical.py:43-50).

    Per-round state is a hash-partitioned label DATASET, never a driver
    dict: each round is (1) one co-partitioned lookup join of the
    symmetric edge table against the labels
    (``ops/joins.copartition_attach`` — sidesteps Ray 2.49's
    empty-partition ``Dataset.join`` fault) chained into one hash-routed
    vectorized min-merge that also counts strictly-lowered labels, and
    (2) a pointer-jumping self-join (``label ← label[label]``) that
    contracts label chains so convergence takes O(log diameter) rounds
    rather than O(diameter) — which is why there is no round-cap escape
    hatch to a driver union-find: the 64-round safety cap covers
    components of astronomically large diameter.

    Partition count scales with the DATA, not a fixed knob: every
    ``map_groups`` emits one block per group, so a fixed 64-way exchange
    over an entity-scale label table floods later rounds with tiny
    blocks (measured 6 s → 26 s/round growth on a 20-node chain before
    this fix). ``parts = clamp(rows / cc_rows_per_partition, 1,
    agg_partitions)`` keeps local runs at 1–2 partitions and 100-TB runs
    at the full fan-out.

    Convergence test: a propagation round that strictly lowers no label
    is a fixpoint — labels then agree across every symmetric edge, hence
    are constant per component, hence equal the component minimum (every
    label is a member id and label(x) ≤ x throughout). The jump runs
    before the convergence check, so the returned labels are always a
    jump past the fixpoint — identity there (comp[comp] == comp)."""
    import pandas as pd

    from ..ops.joins import copartition_attach

    def sym(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "src": pa.concat_arrays([t["x"].combine_chunks(), t["y"].combine_chunks()]),
                "dst": pa.concat_arrays([t["y"].combine_chunks(), t["x"].combine_chunks()]),
            }
        )

    from ..util import compact_nonempty

    # compact_nonempty at every materialization point: (1) drops the
    # schema-less 0-row blocks that aggregate/Project operators emit and
    # map UDFs pass through untouched (they'd crash the shuffle
    # aggregator's finalize sort: "No match for FieldRef.Name(_pkey)"),
    # and (2) resets the lineage's captured DataContext, so a caller that
    # built ``pairs`` inside a hash_shuffle_scope doesn't drag
    # HASH_SHUFFLE into every round of this loop
    edges = compact_nonempty(pairs.map_batches(sym, batch_format="pyarrow"))
    parts = max(
        1, min(cfg.agg_partitions, edges.count() // cfg.cc_rows_per_partition + 1)
    )

    def node_partial(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict({"node": pc.unique(t["src"])})

    labels = compact_nonempty(
        edges.map_batches(node_partial, batch_format="pyarrow")
        .groupby("node")
        .count()
        .map_batches(
            lambda t: pa.Table.from_pydict({"node": t["node"], "comp": t["node"]}),
            batch_format="pyarrow",
        )
    )

    def tag(flag: int):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["_self"] = np.int8(flag)
            df["_pkey"] = (
                pd.util.hash_array(df["node"].to_numpy()) % parts
            ).astype("int32")
            return df

        return f

    def min_merge(g: pd.DataFrame) -> pd.DataFrame:
        new = g.groupby("node", sort=True)["comp"].min()
        old = g.loc[g["_self"] == 1].set_index("node")["comp"]
        out = pd.DataFrame(
            {
                "node": new.index.to_numpy(),
                "comp": new.to_numpy(),
                "changed": (new.to_numpy() < old.reindex(new.index).to_numpy()).astype(
                    "int8"
                ),
            }
        )
        # null-widened unions drift int64 → float64; restore so every
        # group emits one consistent dtype
        for c in ("node", "comp"):
            if out[c].dtype != object:
                out[c] = out[c].astype("int64")
        return out

    for _round in range(64):
        # execution 1: edge-label attach chained straight into the
        # min-merge (no intermediate materialization)
        msgs = copartition_attach(
            edges, labels, "src", "node", {"comp": "comp"}, partitions=parts
        ).map_batches(
            lambda t: pa.Table.from_pydict({"node": t["dst"], "comp": t["comp"]}),
            batch_format="pyarrow",
        )
        merged = compact_nonempty(
            msgs.map_batches(tag(0), batch_format="pandas")
            .union(labels.map_batches(tag(1), batch_format="pandas"))
            .groupby("_pkey")
            .map_groups(min_merge, batch_format="pandas")
        )
        # execution 2: pointer jumping — label ← label[label] (labels
        # joined against themselves; every label value is itself a node,
        # so the inner attach always hits). The ``changed`` count rides
        # along so the convergence check is a cheap sum over the already
        # materialized result, not a third shuffle. At the fixpoint the
        # jump is the identity, so checking AFTER it returns the same
        # labels the pre-jump check would.
        # repartition(parts) bounds the block-count recurrence: sort
        # emits ~one block per input block and the self-join union
        # doubles the input, so without the coalesce the label table's
        # block count quadruples per round (measured 6 → 26 → 106 → 426
        # blocks on a 20-node chain) and orchestration swamps compute
        jumped = compact_nonempty(
            copartition_attach(
                merged, merged, "comp", "node", {"comp": "comp2"}, partitions=parts
            )
            .map_batches(
                lambda t: pa.Table.from_pydict(
                    {"node": t["node"], "comp": t["comp2"], "changed": t["changed"]}
                ),
                batch_format="pyarrow",
            )
            .repartition(parts)
        )
        n_changed = jumped.sum("changed")
        labels = compact_nonempty(
            jumped.map_batches(
                lambda t: pa.Table.from_pydict(
                    {"node": t["node"], "comp": t["comp"]}
                ),
                batch_format="pyarrow",
            )
        )
        if not n_changed:
            return labels
    raise RuntimeError(
        "connected_components_ds failed to converge in 64 rounds "
        "(component diameter beyond 2^63 — unreachable)"
    )


def connected_components(pairs: ray.data.Dataset, cfg: PipelineConfig) -> dict:
    """``{node: component_label}`` for every node in ``pairs`` — the
    driver-dict view of ``connected_components_ds`` for callers whose
    downstream assembly is driver-side anyway (entity-scale). Only the
    FINAL labels are collected; every round of the loop itself runs on
    hash-partitioned datasets."""
    if pairs.count() == 0:
        return {}
    rows = connected_components_ds(pairs, cfg).take_all()
    return {r["node"]: r["comp"] for r in rows}


_CANON_SCHEMA = pa.schema(
    [("norm", pa.string()), ("name", pa.string()),
     ("etype", pa.string()), ("is_new", pa.bool_())]
)


def build_canonical_map(
    mentions_resolved: ray.data.Dataset,
    known_norm_to_name: dict[str, tuple[str, str]],
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> pa.Table:
    """→ Arrow table (norm, name, etype, is_new) on the DRIVER — the
    in-memory convenience form (tests, small builds). ``kg_build`` uses
    :func:`write_canonical_map`, which keeps the fully distributed tier
    a dataset all the way to parquet and never collects it."""
    res = _build_canonical(mentions_resolved, known_norm_to_name, cfg)
    if isinstance(res, ray.data.Dataset):
        pdf = res.to_pandas()
        if not len(pdf):
            return pa.Table.from_pydict(
                {"norm": [], "name": [], "etype": [], "is_new": []},
                schema=_CANON_SCHEMA,
            )
        pdf = pdf.sort_values("norm").reset_index(drop=True)
        return pa.Table.from_pydict(
            {
                "norm": pdf["norm"].tolist(),
                "name": pdf["name"].tolist(),
                "etype": pdf["etype"].tolist(),
                "is_new": [bool(b) for b in pdf["is_new"]],
            },
            schema=_CANON_SCHEMA,
        )
    return res


def write_canonical_map(
    mentions_resolved: ray.data.Dataset,
    known_norm_to_name: dict[str, tuple[str, str]],
    cfg: PipelineConfig,
    out_dir: str,
) -> None:
    """Write the canonical map as a parquet DIRECTORY (1..N files).

    The driver/mid tiers produce a driver-resident table and write one
    file; the fully distributed tier (pairs above
    ``cfg.cc_driver_max_pairs``) stays a hash-partitioned dataset end to
    end and ``write_parquet``s sharded — no norm-scale dict or table
    ever assembles on the driver in that regime (the open-vocabulary
    path the S6 ``resolve_via_copartition`` side already has)."""
    import os

    import pyarrow.parquet as _pq

    res = _build_canonical(mentions_resolved, known_norm_to_name, cfg)
    os.makedirs(out_dir, exist_ok=True)
    if isinstance(res, ray.data.Dataset):
        res.write_parquet(out_dir)
    else:
        _pq.write_table(res, os.path.join(out_dir, "canonical-0.parquet"))


def _build_canonical(
    mentions_resolved: ray.data.Dataset,
    known_norm_to_name: dict[str, tuple[str, str]],
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> "pa.Table | ray.data.Dataset":
    """Size-tiered canonicalization core. Returns a driver ``pa.Table``
    from the two gated driver tiers, or a ``Dataset`` (norm, name,
    etype, is_new) from the fully distributed tier.

    Size-tiered execution: the corpus-scale work (distinct unresolved
    norms) always runs distributed; when the resulting DISTINCT norm set
    is small (≤ ``cfg.canon_driver_max_norms``) the LSH/verify/cluster
    phase runs on the driver via the serial spec
    (``canonical.canonicalize_surfaces`` — identical output by
    definition), skipping 3+ entity-scale shuffle executions whose fixed
    orchestration latency otherwise dominates the stage. Above the
    threshold the LSH/verify phase runs distributed; the pair
    assembly is driver-side while the verified pair set fits
    ``cfg.cc_driver_max_pairs``, and a fully dataset-native assembly
    (:func:`_assemble_canonical_ds`) above that."""
    # ONE corpus-scale scan produces the distinct norm set; both tiers
    # reuse it (the tier probe must not pay a second scan)
    distinct = distinct_unk_norms(mentions_resolved).materialize()
    n_norms = distinct.count()
    if cfg.canon_driver_max_norms > 0 and n_norms <= cfg.canon_driver_max_norms:
        from ..canonical import canonicalize_surfaces

        # empty datasets to_pandas() without columns — guard the lookup
        _pdf = distinct.to_pandas()
        norms = set(_pdf["norm"]) if "norm" in _pdf.columns else set()
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

    import numpy as np

    # Sorted global key list — index order IS lexicographic order,
    # mirroring the serial spec's ``keys = sorted(unk | known)``
    # (canonical.verified_pairs). The list is broadcast ONCE (ray.put —
    # object-store memory, workers map it read-only; it is an input
    # dictionary like the gazetteer, not a per-norm accumulation) and
    # every exchange below carries only fixed-width int rows. Memory
    # envelope: ~20 B/surface → low-GB broadcast at 10^8 distinct
    # surfaces; beyond that the same first-token hive sharding the
    # gazetteer tier uses (stages/gazetteer_shards.py) applies to the
    # key list — out of scope until a corpus actually crosses it.
    _updf = distinct.to_pandas()
    unk_list = _updf["norm"].tolist() if "norm" in _updf.columns else []
    unk_set = set(unk_list)
    keys = sorted(unk_set | set(known_norm_to_name))
    is_unk = np.fromiter((k in unk_set for k in keys), dtype=bool, count=len(keys))
    norms_ref = ray.put(keys)
    unk_ref = ray.put(is_unk)

    perms = make_perms(cfg.minhash_perms)
    from ..util import hash_shuffle_scope

    with hash_shuffle_scope():
        pairs = (
            ray.data.range(len(keys))
            .map_batches(
                lambda t: _band_rows_idx(t, cfg, perms, norms_ref),
                batch_format="pyarrow", batch_size=2048,
            )
            .groupby("pkey")
            .map_groups(
                lambda g: _partition_pairs_idx(g, cfg, norms_ref, unk_ref),
                batch_format="pyarrow",
            )
            .materialize()
        )
    # cross-partition duplicate pairs are possible (same pair surfacing
    # via bands routed to different partitions) — deduped below on the
    # driver path; the distributed fallbacks are idempotent over them.

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
        import pandas as pd

        pdf = pairs.to_pandas()
        xi = pdf["x"].to_numpy(np.int64)
        yi = pdf["y"].to_numpy(np.int64)
        jv = pdf["j"].to_numpy()
        # cross-partition duplicate pairs: one packed-int unique pass
        # (same pair always scores the same j, so any copy works)
        packed = xi * len(keys) + yi
        _, first = np.unique(packed, return_index=True)
        xi, yi, jv = xi[first], yi[first], jv[first]
        xu = is_unk[xi]
        yu = is_unk[yi]
        # unk→known attachments, vectorized: sort by (unk, -j, known) and
        # keep the first row per unk = argmax j with min-known tie-break
        # (index order == lex order, so int sort IS the spec's tie-break)
        mixed = xu ^ yu
        if mixed.any():
            att = pd.DataFrame(
                {
                    "unk": np.where(xu[mixed], xi[mixed], yi[mixed]),
                    "kn": np.where(xu[mixed], yi[mixed], xi[mixed]),
                    "j": jv[mixed],
                }
            ).sort_values(
                ["unk", "j", "kn"], ascending=[True, False, True], kind="mergesort"
            ).drop_duplicates("unk")
            att_map = {
                keys[u]: (j, keys[k])
                for u, j, k in zip(att["unk"], att["j"], att["kn"])
            }
        both = xu & yu
        if both.any():
            nodes, lab = min_label_components(xi[both], yi[both])
            comp_map = {
                keys[nodes[i]]: keys[nodes[lab[i]]]
                for i in range(len(nodes))
                if lab[i] != i
            }
    else:
        return _assemble_canonical_ds(
            pairs, keys, norms_ref, unk_ref, known_norm_to_name, cfg
        )

    # Assemble on the driver — both remaining tiers are gated
    # (canon_driver_max_norms / cc_driver_max_pairs), so every table
    # here is bounded driver state by configuration, not by luck.

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
    return pa.Table.from_pydict(out, schema=_CANON_SCHEMA)


def _assemble_canonical_ds(
    pairs: ray.data.Dataset,
    keys: list[str],
    norms_ref,
    unk_ref,
    known_norm_to_name: dict[str, tuple[str, str]],
    cfg: PipelineConfig,
) -> ray.data.Dataset:
    """Fully dataset-native canonical-map assembly — the open-vocabulary
    tier. Nothing norm-scale ever lands on the driver here: the
    per-unknown attachment argmax is a per-batch partial merged through
    ONE hash-routed exchange, the unk–unk clusters come from
    ``connected_components_ds`` (hash-partitioned label datasets), the
    per-COMPONENT best attachment is one comp-routed vectorized fold,
    and the final (norm, name, etype, is_new) rows are produced per
    batch against the broadcast key list. Exchanges carry fixed-width
    int rows only; strings appear exactly once, in the output batches.

    Driver state: the broadcast key list / unk mask (shared with the
    LSH phase) and the gazetteer-scale known dict — both inputs, not
    per-norm accumulations.

    Reference contrast: the reference folds its whole surface universe
    through one in-process dict (``blarify``'s name-registry shape); at
    10⁸–10⁹ distinct web surfaces that is the driver-memory cliff this
    tier removes (SURVEY §1.1)."""
    import pandas as pd

    from ..ops.joins import copartition_attach
    from ..util import compact_nonempty
    from ..util import get_broadcast as get_broadcast_local

    P = cfg.agg_partitions
    known_ref = ray.put(known_norm_to_name)
    n_keys = len(keys)
    # `pairs` was materialized inside the LSH hash_shuffle_scope; rebuild
    # its lineage so the exchanges below plan under the caller's default
    # (sort-based) shuffle strategy instead of dragging HASH_SHUFFLE in
    pairs = compact_nonempty(pairs)

    def att_partial(t: pa.Table) -> pa.Table:
        # per-batch argmax per unk (vectorized): the merge exchange sees
        # at most one row per (unk, batch), not one per pair
        iu = get_broadcast_local(unk_ref)
        xi = t["x"].to_numpy()
        yi = t["y"].to_numpy()
        jv = t["j"].to_numpy()
        mixed = iu[xi] ^ iu[yi]
        if not mixed.any():
            return pa.Table.from_pydict(
                {"unk": [], "kn": [], "j": []},
                schema=pa.schema(
                    [("unk", pa.int64()), ("kn", pa.int64()), ("j", pa.float64())]
                ),
            )
        df = pd.DataFrame(
            {
                "unk": np.where(iu[xi[mixed]], xi[mixed], yi[mixed]).astype(np.int64),
                "kn": np.where(iu[xi[mixed]], yi[mixed], xi[mixed]).astype(np.int64),
                "j": jv[mixed],
            }
        ).sort_values(
            ["unk", "j", "kn"], ascending=[True, False, True], kind="mergesort"
        ).drop_duplicates("unk")
        return pa.Table.from_pydict(
            {
                "unk": pa.array(df["unk"].to_numpy(np.int64)),
                "kn": pa.array(df["kn"].to_numpy(np.int64)),
                "j": pa.array(df["j"].to_numpy()),
            }
        )

    def att_route(t: pa.Table) -> pa.Table:
        pk = (t["unk"].to_numpy() % P).astype(np.int32)
        return t.append_column("_pkey", pa.array(pk, pa.int32()))

    def att_merge(g: pd.DataFrame) -> pd.DataFrame:
        # global argmax per unk inside its hash partition (index order ==
        # lex order, so min-kn int IS the spec's min-lex tie-break)
        g = g.sort_values(
            ["unk", "j", "kn"], ascending=[True, False, True], kind="mergesort"
        ).drop_duplicates("unk")
        return g[["unk", "kn", "j"]].reset_index(drop=True)

    att_ds = (
        pairs.map_batches(att_partial, batch_format="pyarrow")
        .map_batches(att_route, batch_format="pyarrow")
        .groupby("_pkey")
        .map_groups(att_merge, batch_format="pandas")
        .materialize()
    )
    n_att = att_ds.count()

    def uu_int(t: pa.Table) -> pa.Table:
        iu = get_broadcast_local(unk_ref)
        xi = t["x"].to_numpy()
        yi = t["y"].to_numpy()
        both = iu[xi] & iu[yi]
        return pa.Table.from_pydict(
            {
                "x": pa.array(xi[both].astype(np.int64)),
                "y": pa.array(yi[both].astype(np.int64)),
            }
        )

    uu = pairs.map_batches(uu_int, batch_format="pyarrow").materialize()

    # base unk universe as a dataset: range over the key index space,
    # filtered by the broadcast unk mask — never a driver list round-trip
    def to_unk(t: pa.Table) -> pa.Table:
        iu = get_broadcast_local(unk_ref)
        ids = t["id"].to_numpy()
        return pa.Table.from_pydict({"unk": pa.array(ids[iu[ids]], pa.int64())})

    u_ds = ray.data.range(n_keys).map_batches(to_unk, batch_format="pyarrow")

    # attach each member's component label (CC labels stay a dataset);
    # singletons default to self
    if uu.count() > 0:
        comp_ds = connected_components_ds(uu, cfg)
        u_ds = copartition_attach(
            u_ds, comp_ds, "unk", "node", {"comp": "comp"}, partitions=P, how="left"
        )

        def fill_comp(df: pd.DataFrame) -> pd.DataFrame:
            u = df["unk"].to_numpy(np.int64)
            # left-join misses surface as float NaN OR object None
            # depending on the merge group's dtype promotion
            miss = df["comp"].isna().to_numpy()
            c = np.where(miss, u, df["comp"].to_numpy())
            return pd.DataFrame({"unk": u, "comp": c.astype(np.int64)})

        u_ds = u_ds.map_batches(fill_comp, batch_format="pandas")
    else:

        def self_comp(t: pa.Table) -> pa.Table:
            return t.append_column("comp", t["unk"])

        u_ds = u_ds.map_batches(self_comp, batch_format="pyarrow")
    u_ds = u_ds.materialize()

    # per-COMPONENT best attachment: tag each attachment row with its
    # member's component, then ONE comp-routed vectorized argmax fold
    if n_att > 0:
        att_c = copartition_attach(
            att_ds, u_ds, "unk", "unk", {"comp": "comp"}, partitions=P, how="inner"
        )

        def cb_route(df: pd.DataFrame) -> pd.DataFrame:
            df = df[["comp", "kn", "j"]].copy()
            df["_pkey"] = (df["comp"].to_numpy(np.int64) % P).astype(np.int32)
            return df

        def cb_merge(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values(
                ["comp", "j", "kn"], ascending=[True, False, True], kind="mergesort"
            ).drop_duplicates("comp")
            return pd.DataFrame(
                {
                    "comp": g["comp"].to_numpy(np.int64),
                    "best_kn": g["kn"].to_numpy(np.int64),
                }
            )

        cb_ds = (
            att_c.map_batches(cb_route, batch_format="pandas")
            .groupby("_pkey")
            .map_groups(cb_merge, batch_format="pandas")
        )
        full = copartition_attach(
            u_ds, cb_ds, "comp", "comp", {"best_kn": "best_kn"}, partitions=P, how="left"
        )
    else:

        def no_best(t: pa.Table) -> pa.Table:
            return t.append_column(
                "best_kn", pa.array(np.full(t.num_rows, -1, np.int64))
            )

        full = u_ds.map_batches(no_best, batch_format="pyarrow")

    def finish(df: pd.DataFrame) -> pa.Table:
        kl = get_broadcast_local(norms_ref)
        kn_map = get_broadcast_local(known_ref)
        unk = df["unk"].to_numpy(np.int64)
        comp = df["comp"].to_numpy(np.int64)
        miss = df["best_kn"].isna().to_numpy()  # left-join nulls (float or object)
        bk = np.where(miss, -1, df["best_kn"].to_numpy()).astype(np.int64)
        names, etypes = [], []
        for c, b in zip(comp, bk):
            if b >= 0:
                nm, t = kn_map[kl[b]]
                names.append(nm)
                etypes.append(t)
            else:
                names.append(kl[c])  # min member = component label
                etypes.append("UNK")
        return pa.Table.from_pydict(
            {
                "norm": [kl[i] for i in unk],
                "name": names,
                "etype": etypes,
                "is_new": (bk < 0).tolist(),
            },
            schema=_CANON_SCHEMA,
        )

    return full.map_batches(finish, batch_format="pandas")


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
