"""Deduplication operators for training-data pipelines.

- exact_dedup            content-hash partial + one hash-partitioned
                         shuffle, keep min-id row (vectorized inside)
- minhash_near_dup       word-shingle MinHash + LSH banding → candidate
                         id pairs → exact n-gram Jaccard verify (texts
                         fetched only for candidates) → min-label
                         clusters → survivors
- simhash_near_dup       64-bit SimHash + 16-bit band blocking → Hamming
                         verify (hot-bucket capped)
- (embedding cosine near-dup lives in ops/similarity.py)

All follow the partial/blocked pattern and the partition-safety rules the
KG canonicalize stage (``stages/canonicalize.py``) established:

* the LSH shuffle moves (pkey, band, id) rows ONLY — never the document
  text or the signature; texts are re-read (pruned by a broadcast
  candidate-id set) and attached to candidate pairs by a co-partitioned
  lookup join, so the heavy column moves once, for candidates only;
* whole buckets are routed to ``agg_partitions`` Ray-level groups
  (``bh % agg_partitions``), not one Python call per bucket;
* buckets larger than ``cfg.max_lsh_bucket`` are skipped (hot-bucket /
  skew guard — boilerplate text otherwise costs O(n²));
* clustering pulls pairs to the driver only below
  ``cfg.cc_driver_max_pairs``; above it the distributed min-label loop
  (``stages/canonicalize.connected_components``) takes over.

Reference analog: the content-hash→embed-once aggregate
(``blarify/services/embedding_service.py:97-144``) and the SCIP symbol
blocking join (``scip_helper.py:875-923``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..minhash import make_perms, shingle_hash32


def exact_dedup(
    ds: ray.data.Dataset, text_col: str, id_col: str, partitions: int = 64
) -> ray.data.Dataset:
    """Keep exactly one row (min id) per distinct text.

    Scale shape: a per-batch PARTIAL (vectorized ``drop_duplicates``
    keeps the min-id row per hash inside each batch) then ONE shuffle
    grouped by ``hash(md5) % partitions`` — a bounded number of Ray-level
    groups with a vectorized merge inside, never one Python call per
    distinct text (the ``dedup_latest`` pattern, stages/extract.py)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        md5s = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in df[text_col]]
        df = df.assign(_md5=md5s)
        df = df.sort_values(["_md5", id_col], kind="mergesort").drop_duplicates("_md5")
        df["_pkey"] = (
            pd.util.hash_array(df["_md5"].to_numpy(dtype=object)) % partitions
        ).astype("int32")
        return df

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_md5", id_col], kind="mergesort").drop_duplicates("_md5")
        return g.drop(columns=["_md5", "_pkey"])

    return (
        ds.map_batches(partial, batch_format="pandas", batch_size=4096)
        .groupby("_pkey")
        .map_groups(merge, batch_format="pandas")
    )


def _word_shingles(text: str, k: int) -> set[str]:
    toks = text.split()
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


def minhash_band_rows(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    cfg: PipelineConfig,
    shingle_words: int,
    perms,
) -> ray.data.Dataset:
    """IDs-ONLY LSH band rows: (pkey, band_id, band_hash, id). The text
    and the signature never enter the shuffle — at 100 TB the banding
    exchange moves ~32 small ints per document, not 32 copies of the
    document.

    The hot inner loop is vectorized batch-wise (the canonicalize-stage
    pattern): signatures come out as ONE (n_docs × n_perms) matrix via a
    concatenated-shingle ``np.minimum.reduceat`` sweep, banding as one
    (n_docs × n_bands) FNV pass — bit-identical per row to the scalar
    ``minhash_signature``/``band_hashes`` (empty docs get the all-max
    sentinel signature)."""
    from ..minhash import band_hashes_batch

    n_perms = len(perms[0])

    def sig_rows(t: pa.Table) -> pa.Table:
        a, b = perms
        ids = np.asarray(t[id_col].combine_chunks(), dtype=np.int64)
        texts = t[text_col].to_pylist()
        codes = [
            np.fromiter(
                (shingle_hash32(s) for s in sorted(sh)), np.uint64, count=len(sh)
            )
            for sh in (_word_shingles(x, shingle_words) for x in texts)
        ]
        sigs = np.full((len(texts), n_perms), np.iinfo(np.uint64).max, np.uint64)
        ne = np.fromiter((len(c) > 0 for c in codes), bool, count=len(codes))
        if ne.any():
            kept = [c for c in codes if len(c)]
            lens = np.fromiter((len(c) for c in kept), np.int64, count=len(kept))
            flat = np.concatenate(kept)
            starts = np.zeros(len(kept), np.int64)
            np.cumsum(lens[:-1], out=starts[1:])
            m = (a[:, None] * flat[None, :] + b[:, None]) % np.uint64((1 << 31) - 1)
            sigs[ne] = np.minimum.reduceat(m, starts, axis=1).T
        bands = band_hashes_batch(sigs, cfg.lsh_bands)  # (n_docs, n_bands)
        bh = bands.reshape(-1)  # doc-major, band order — the scalar loop's order
        return pa.Table.from_pydict(
            {
                "pkey": pa.array((bh % np.uint64(cfg.agg_partitions)).astype(np.int32)),
                "band_id": pa.array(
                    np.tile(np.arange(cfg.lsh_bands, dtype=np.int32), len(texts))
                ),
                "band_hash": pa.array(bh, pa.uint64()),
                "id": pa.array(np.repeat(ids, cfg.lsh_bands)),
            }
        )

    return ds.map_batches(sig_rows, batch_format="pyarrow")


def candidate_pairs(bands: ray.data.Dataset, cfg: PipelineConfig) -> ray.data.Dataset:
    """Band rows → globally-distinct candidate id pairs (a < b).
    Whole buckets are reconstructed inside each routed partition
    (``stages/canonicalize._partition_pairs_idx`` pattern); buckets above
    ``cfg.max_lsh_bucket`` are skipped (hot-bucket cap)."""

    def bucket_pairs(g: pa.Table) -> pa.Table:
        buckets: dict[tuple[int, int], list[int]] = {}
        for band_id, bh, i in zip(
            g["band_id"].to_pylist(), g["band_hash"].to_pylist(), g["id"].to_pylist()
        ):
            buckets.setdefault((band_id, bh), []).append(i)
        seen: set[tuple[int, int]] = set()
        out = {"a": [], "b": []}
        for members0 in buckets.values():
            if len(members0) < 2 or len(members0) > cfg.max_lsh_bucket:
                continue
            members = sorted(set(members0))
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    p = (members[x], members[y])
                    if p not in seen:
                        seen.add(p)
                        out["a"].append(p[0])
                        out["b"].append(p[1])
        return pa.Table.from_pydict(
            out, schema=pa.schema([("a", pa.int64()), ("b", pa.int64())])
        )

    pairs = bands.groupby("pkey").map_groups(bucket_pairs, batch_format="pyarrow")
    # the same pair can surface in buckets routed to different partitions —
    # global dedup is a small groupby over id pairs
    return pairs.groupby(["a", "b"]).count().select_columns(["a", "b"])


def attach_pair_payload(
    pairs: ray.data.Dataset,
    items: ray.data.Dataset,
    id_col: str,
    payload_col: str,
    partitions: int = 64,
) -> ray.data.Dataset:
    """pairs[(a, b)] → pairs[(a, b, _pa, _pb)]: the payload column fetched
    for BOTH sides via two co-partitioned lookup joins. ``items`` should
    already be pruned to candidate ids (broadcast-set filter) so the heavy
    payload moves only for candidates."""
    from .joins import copartition_attach

    withx = copartition_attach(
        pairs, items, "a", id_col, {payload_col: "_pa"}, partitions=partitions
    )
    return copartition_attach(
        withx, items, "b", id_col, {payload_col: "_pb"}, partitions=partitions
    )


def _filter_items_to_candidates(
    ds: ray.data.Dataset, id_col: str, cols: list[str], cand_arr_ref
) -> ray.data.Dataset:
    """``cand_arr_ref``: ObjectRef of a sorted ``pa.int64`` array built
    ONCE on the driver — workers fetch it once via the broadcast cache,
    never rebuild it per batch."""

    def flt(t: pa.Table) -> pa.Table:
        from ..util import get_broadcast

        arr = get_broadcast(cand_arr_ref)
        mask = pc.is_in(pc.cast(t[id_col], pa.int64()), value_set=arr)
        return t.filter(mask).select(cols)

    return ds.map_batches(flt, batch_format="pyarrow")


def items_for_candidates(
    ds: ray.data.Dataset,
    cand: ray.data.Dataset,
    id_col: str,
    cols: list[str],
    cfg: PipelineConfig,
    partitions: int = 64,
) -> ray.data.Dataset:
    """Prune ``ds`` to rows whose id appears in the candidate-pair table
    ``cand[(a, b)]`` — size-tiered:

    * ≤ ``cfg.dedup_candidate_broadcast_max`` pairs: distinct ids pulled
      once to the driver, broadcast as ONE sorted int64 array, applied
      with vectorized ``pc.is_in``;
    * above: the distinct id set is derived distributed (per-batch
      ``np.unique`` partial + key-scale distinct groupby) and the items
      are pruned by a co-partitioned SEMI-join (marker-column
      ``copartition_attach``) — the pair table never materializes on
      the driver.

    Both tiers produce identical output (forced-tier tested)."""
    n_pairs = cand.count()
    if n_pairs <= cfg.dedup_candidate_broadcast_max:
        pdf = cand.to_pandas()
        ids = (
            np.unique(
                np.concatenate(
                    [pdf["a"].to_numpy(np.int64), pdf["b"].to_numpy(np.int64)]
                )
            )
            if len(pdf)
            else np.array([], np.int64)
        )
        ref = ray.put(pa.array(ids, pa.int64()))
        return _filter_items_to_candidates(ds, id_col, cols, ref)

    def ids_partial(t: pa.Table) -> pa.Table:
        u = np.unique(
            np.concatenate(
                [t["a"].to_numpy().astype(np.int64), t["b"].to_numpy().astype(np.int64)]
            )
        )
        return pa.Table.from_pydict({"id": pa.array(u, pa.int64())})

    ids_ds = (
        cand.map_batches(ids_partial, batch_format="pyarrow")
        .groupby("id")
        .count()
        .select_columns(["id"])
        .map_batches(
            lambda t: t.append_column(
                "_m", pa.array(np.ones(t.num_rows, np.int8))
            ),
            batch_format="pyarrow",
        )
    )
    from .joins import copartition_attach

    left = ds.map_batches(lambda t: t.select(cols), batch_format="pyarrow")
    pruned = copartition_attach(
        left, ids_ds, id_col, "id", {"_m": "_m"}, partitions=partitions, how="inner"
    )
    return pruned.map_batches(lambda t: t.select(cols), batch_format="pyarrow")


def cluster_pairs_min_label(
    pairs: ray.data.Dataset, cfg: PipelineConfig
) -> list[tuple[int, int]]:
    """Verified pairs → [(id, cluster_min_id)] for every non-root member.
    Driver union-find below ``cfg.cc_driver_max_pairs``; the distributed
    min-label-propagation loop above it (same policy as the KG
    canonicalize stage)."""
    n_pairs = pairs.count()
    if n_pairs == 0:
        return []
    if n_pairs <= cfg.cc_driver_max_pairs:
        pdf = pairs.to_pandas()
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in zip(pdf["a"], pdf["b"]):
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                if rb < ra:
                    ra, rb = rb, ra
                parent[rb] = ra
        return sorted((x, find(x)) for x in parent if find(x) != x)

    # distributed fallback: min-label propagation is type-generic — reuse
    # the canonicalize loop over (x, y) int columns. The label table is
    # collected here because this helper's API is a driver list; callers
    # that must stay dataset-native above the gate (minhash_near_dup)
    # use cluster_pairs_min_label_ds instead.
    rows = cluster_pairs_min_label_ds(pairs, cfg).take_all()
    return sorted((int(r["id"]), int(r["dup_of"])) for r in rows)


def cluster_pairs_min_label_ds(
    pairs: ray.data.Dataset, cfg: PipelineConfig
) -> ray.data.Dataset:
    """Dataset-native form of the distributed tier: verified (a, b) int
    pairs → Dataset[(id, dup_of)] for every non-root member, via the
    hash-partitioned min-label loop (``connected_components_ds``). The
    cluster table NEVER lands on the driver — at a 100-TB corpus the
    duplicate set is itself corpus-scale (30-50% of a raw web crawl),
    far beyond driver RAM."""
    from ..stages.canonicalize import connected_components_ds

    renamed = pairs.map_batches(
        lambda t: pa.Table.from_pydict({"x": t["a"], "y": t["b"]}),
        batch_format="pyarrow",
    )

    def non_roots(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keep = pc.not_equal(t["node"], t["comp"])
        f = t.filter(keep)
        return pa.Table.from_pydict(
            {
                "id": pc.cast(f["node"], pa.int64()),
                "dup_of": pc.cast(f["comp"], pa.int64()),
            }
        )

    return connected_components_ds(renamed, cfg).map_batches(
        non_roots, batch_format="pyarrow"
    )


def minhash_near_dup(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    shingle_words: int = 3,
    jaccard_threshold: float = 0.7,
) -> ray.data.Dataset:
    """→ ds[(id, dup_of)] — every row whose text near-duplicates a row
    with smaller id (dup_of = that smaller id, transitively the cluster
    minimum).

    Pipeline: signature (map_batches, computed once, never shuffled) →
    ids-only band rows → partition-routed buckets (capped) → distinct
    candidate id pairs → texts fetched for candidate ids only
    (size-tiered ``items_for_candidates``: broadcast-set prune or
    co-partitioned semi-join) → exact n-gram Jaccard verify → min-label
    clusters (driver under threshold, distributed above)."""
    perms = make_perms(cfg.minhash_perms, seed="blarify-ray:docdedup")
    bands = minhash_band_rows(ds, text_col, id_col, cfg, shingle_words, perms)
    cand = candidate_pairs(bands, cfg).materialize()

    # prune the text scan to candidate ids (candidate set is pairs-scale —
    # orders of magnitude below corpus scale thanks to banding + caps)
    if cand.count() == 0:
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {"id": pa.array([], pa.int64()), "dup_of": pa.array([], pa.int64())}
            )
        )
    texts = items_for_candidates(ds, cand, id_col, [id_col, text_col], cfg)
    enriched = attach_pair_payload(cand, texts, id_col, text_col)

    def verify(t: pa.Table) -> pa.Table:
        out = {"a": [], "b": []}
        for a, b, ta, tb in zip(
            t["a"].to_pylist(), t["b"].to_pylist(),
            t["_pa"].to_pylist(), t["_pb"].to_pylist(),
        ):
            sa = _word_shingles(ta, shingle_words)
            sb = _word_shingles(tb, shingle_words)
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            if union and inter / union >= jaccard_threshold:
                out["a"].append(a)
                out["b"].append(b)
        return pa.Table.from_pydict(
            out, schema=pa.schema([("a", pa.int64()), ("b", pa.int64())])
        )

    verified = enriched.map_batches(verify, batch_format="pyarrow").materialize()
    # size-tiered cluster resolution: driver union-find below the gate
    # (latency), the hash-partitioned min-label loop above it — the
    # cluster table stays a DATASET there (duplicate sets are
    # corpus-scale on raw web crawls; forced-tier parity tested)
    if verified.count() <= cfg.cc_driver_max_pairs:
        rows = cluster_pairs_min_label(verified, cfg)
        tbl = pa.Table.from_pydict(
            {
                "id": pa.array([r[0] for r in rows], pa.int64()),
                "dup_of": pa.array([r[1] for r in rows], pa.int64()),
            }
        )
        return ray.data.from_arrow(tbl)
    return cluster_pairs_min_label_ds(verified, cfg)


# --- SimHash ---------------------------------------------------------------

def _simhash64(tokens: list[str]) -> int:
    acc = np.zeros(64, dtype=np.int64)
    for tok in tokens:
        h = int.from_bytes(hashlib.md5(tok.encode("utf-8")).digest()[:8], "big")
        bits = np.unpackbits(np.frombuffer(h.to_bytes(8, "big"), dtype=np.uint8)).astype(np.int64)
        acc += bits * 2 - 1
    out = 0
    for i, v in enumerate(acc):
        if v > 0:
            out |= 1 << (63 - i)
    return out


def simhash_docs(ds: ray.data.Dataset, text_col: str, id_col: str) -> ray.data.Dataset:
    """→ ds[(id, simhash: uint64)]."""

    def sh(t: pa.Table) -> pa.Table:
        hs = [_simhash64(x.split()) for x in t[text_col].to_pylist()]
        return pa.Table.from_pydict(
            {"id": pc.cast(t[id_col], pa.int64()), "simhash": pa.array(hs, pa.uint64())}
        )

    return ds.map_batches(sh, batch_format="pyarrow")


def simhash_near_dup(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    max_bucket: int = 200,
) -> ray.data.Dataset:
    """→ ds[(a, b, hamming)] pairs with Hamming distance ≤ max_hamming.
    Blocking: 4 × 16-bit bands (pigeonhole: any pair within distance 3
    shares at least one exact band). Only the 8-byte signature moves
    through the shuffle; buckets above ``max_bucket`` are skipped (the
    hot-bucket cap — a band value shared by boilerplate/empty docs would
    otherwise cost O(n²))."""
    sigs = simhash_docs(ds, text_col, id_col)
    parts = DEFAULT_CONFIG.agg_partitions

    def band_rows(t: pa.Table) -> pa.Table:
        out = {"pkey": [], "band_id": [], "band_val": [], "id": [], "simhash": []}
        for i, h in zip(t["id"].to_pylist(), t["simhash"].to_pylist()):
            for b in range(4):
                v = (h >> (16 * b)) & 0xFFFF
                # route WHOLE buckets to ~parts Ray-level groups
                out["pkey"].append((v * 4 + b) % parts)
                out["band_id"].append(b)
                out["band_val"].append(v)
                out["id"].append(i)
                out["simhash"].append(h)
        return pa.Table.from_pydict(
            out,
            schema=pa.schema(
                [("pkey", pa.int32()), ("band_id", pa.int32()), ("band_val", pa.int32()),
                 ("id", pa.int64()), ("simhash", pa.uint64())]
            ),
        )

    def verify(g: pa.Table) -> pa.Table:
        buckets: dict[tuple[int, int], list[tuple[int, int]]] = {}
        for b, v, i, h in zip(
            g["band_id"].to_pylist(), g["band_val"].to_pylist(),
            g["id"].to_pylist(), g["simhash"].to_pylist(),
        ):
            buckets.setdefault((b, v), []).append((i, h))
        out = {"a": [], "b": [], "hamming": []}
        for members in buckets.values():
            if not (2 <= len(members) <= max_bucket):
                continue
            members = sorted(set(members))
            for x in range(len(members)):
                for y in range(x + 1, len(members)):
                    ia, ha = members[x]
                    ib, hb = members[y]
                    if ia == ib:
                        continue
                    d = bin(ha ^ hb).count("1")
                    if d <= max_hamming:
                        out["a"].append(ia)
                        out["b"].append(ib)
                        out["hamming"].append(d)
        return pa.Table.from_pydict(
            out, schema=pa.schema([("a", pa.int64()), ("b", pa.int64()), ("hamming", pa.int64())])
        )

    pairs = (
        sigs.map_batches(band_rows, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(verify, batch_format="pyarrow")
    )
    # a pair can surface from several bands — global dedup via groupby
    return pairs.groupby(["a", "b"]).min("hamming").map_batches(
        lambda t: pa.Table.from_pydict(
            {"a": t["a"], "b": t["b"], "hamming": t["min(hamming)"]}
        ),
        batch_format="pyarrow",
    )


# --- exact n-gram span duplicates (ExactSubstr-style, Lee et al. 2022) -------

NGRAM_SPAN_B = np.uint64(1_000_003)  # polynomial rolling-hash base


def ngram_span_dups(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    n_tokens: int = 20,
    stride: int = 1,
    max_bucket: int = 1000,
    partitions: int = 64,
) -> ray.data.Dataset:
    """Cross-document duplicate SPANS: every (doc, token_pos) whose
    ``n_tokens``-token window appears verbatim in ≥2 distinct documents —
    the removal list of exact-substring dedup (the decontamination-grade
    complement of MinHash: no similarity threshold, byte-exact windows).

    Scale shape: each batch hashes every token ONCE
    (``pd.util.hash_array`` over the exploded token column) and builds
    window hashes with ``n_tokens`` vectorized polynomial steps — no
    per-window Python, no window TEXT anywhere. The exchange moves
    fixed-width (hash, doc, pos) int rows (window-scale ÷ ``stride``;
    this volume is inherent to exact-substring dedup — suffix-array
    builds move the same order of data), grouped by ``hash(h) %
    partitions`` with a vectorized ≥2-distinct-docs filter per
    partition. ``max_bucket`` caps pathological hashes (boilerplate
    repeated in thousands of docs) exactly like the LSH hot-bucket
    guard. Returns ds[(gram_hash, id, pos, n_docs)] sorted within
    partitions by (gram_hash, id, pos).
    """

    def windows(df: pd.DataFrame) -> pd.DataFrame:
        # raw split semantics (empty tokens kept): positions equal the
        # split index, so a SQL oracle over string_split sees the SAME
        # windows — only all-null rows (no text) are dropped
        s = df.set_index(id_col)[text_col].str.split(" ").explode()
        s = s[s.notna()]
        if s.empty:
            return pd.DataFrame(
                {"h": pd.Series([], dtype=np.uint64),
                 "id": pd.Series([], dtype=np.int64),
                 "pos": pd.Series([], dtype=np.int64),
                 "_pkey": pd.Series([], dtype="int32")}
            )
        th = pd.util.hash_array(s.to_numpy(dtype=object))  # uint64 per token
        doc = s.index.to_numpy()
        pos = pd.Series(1, index=s.index).groupby(level=0).cumcount().to_numpy()
        L = len(th) - n_tokens + 1
        if L <= 0:
            return windows(df.iloc[0:0])
        h = np.zeros(L, dtype=np.uint64)
        for j in range(n_tokens):
            h = h * NGRAM_SPAN_B + th[j : L + j]
        same_doc = doc[:L] == doc[n_tokens - 1 :]
        keep = same_doc & (pos[:L] % stride == 0)
        out = pd.DataFrame(
            {
                "h": h[keep],
                "id": doc[:L][keep].astype(np.int64),
                "pos": pos[:L][keep].astype(np.int64),
            }
        )
        out["_pkey"] = (out["h"] % np.uint64(partitions)).astype("int32")
        return out

    def dups(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.groupby("h")["id"].nunique()
        hot = nd[(nd >= 2) & (nd <= max_bucket)]
        keep = g[g["h"].isin(hot.index)].copy()
        keep["n_docs"] = keep["h"].map(hot).astype(np.int64)
        keep = keep.sort_values(["h", "id", "pos"], kind="mergesort")
        keep["gram_hash"] = keep["h"].astype(np.uint64)
        return keep[["gram_hash", "id", "pos", "n_docs"]].reset_index(drop=True)

    return (
        ds.map_batches(windows, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(dups, batch_format="pandas")
    )


def ngram_span_removal(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    n_tokens: int = 20,
    max_bucket: int = 1000,
    partitions: int = 64,
) -> ray.data.Dataset:
    """Apply exact-substring dedup (the ExactSubstr CLEANUP, Lee et al.
    2022): every occurrence of an ``n_tokens``-token window that appears
    verbatim in ≥2 distinct documents is excised EXCEPT the corpus-wide
    first occurrence (min doc id, then min position) — overlapping
    duplicate windows union into one removed span. Returns
    ds[(id, text_clean, n_removed)] covering EVERY input doc (null text
    → "" / 0 removed). Grams shared by more than ``max_bucket`` docs
    are left in place (the hot-boilerplate cap, mirrored by the oracle).

    Scale shape: stage 1 is ``ngram_span_dups``'s windows+group pass
    with a drop-the-global-first rule per gram (all rows of a gram hash
    land in one partition group, so the within-group first IS global);
    only fixed-width (id, pos) int marks come out. Stage 2 co-partitions
    marks with the doc TEXT by ``hash(id) % partitions`` — the one
    text-moving exchange, inherent to string surgery — and rebuilds each
    doc with a vectorized difference-array mask over token positions."""

    def windows(df: pd.DataFrame) -> pd.DataFrame:
        s = df.set_index(id_col)[text_col].fillna("").str.split(" ").explode()
        if s.empty:
            return pd.DataFrame(
                {"h": pd.Series([], dtype=np.uint64),
                 "id": pd.Series([], dtype=np.int64),
                 "pos": pd.Series([], dtype=np.int64),
                 "_pkey": pd.Series([], dtype="int32")}
            )
        th = pd.util.hash_array(s.to_numpy(dtype=object))
        doc = s.index.to_numpy()
        pos = pd.Series(1, index=s.index).groupby(level=0).cumcount().to_numpy()
        L = len(th) - n_tokens + 1
        if L <= 0:
            return windows(df.iloc[0:0])
        h = np.zeros(L, dtype=np.uint64)
        for j in range(n_tokens):
            h = h * NGRAM_SPAN_B + th[j : L + j]
        keep = doc[:L] == doc[n_tokens - 1 :]
        out = pd.DataFrame(
            {"h": h[keep], "id": doc[:L][keep].astype(np.int64),
             "pos": pos[:L][keep].astype(np.int64)}
        )
        out["_pkey"] = (out["h"] % np.uint64(partitions)).astype("int32")
        return out

    def marks(g: pd.DataFrame) -> pd.DataFrame:
        nd = g.groupby("h")["id"].nunique()
        hot = nd[(nd >= 2) & (nd <= max_bucket)]
        m = g[g["h"].isin(hot.index)]
        m = m.sort_values(["h", "id", "pos"], kind="mergesort")
        first = np.ones(len(m), dtype=bool)
        hv = m["h"].to_numpy()
        first[1:] = hv[1:] != hv[:-1]
        m = m[~first]
        out = pd.DataFrame(
            {"id": m["id"].to_numpy(np.int64), "pos": m["pos"].to_numpy(np.int64)}
        )
        out["_pkey"] = (
            pd.util.hash_array(out["id"].to_numpy()) % np.uint64(partitions)
        ).astype("int32")
        return out

    mark_rows = (
        ds.map_batches(windows, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(marks, batch_format="pandas")
    )

    def doc_rows(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"id": df[id_col].to_numpy(np.int64),
             "text": df[text_col].fillna("").astype(str),
             "pos": np.int64(-1)}
        )
        out["_pkey"] = (
            pd.util.hash_array(out["id"].to_numpy()) % np.uint64(partitions)
        ).astype("int32")
        return out

    def widen_marks(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["text"] = ""
        return df[["id", "text", "pos", "_pkey"]]

    def excise(g: pd.DataFrame) -> pd.DataFrame:
        docs = g[g["pos"] < 0]
        mk = g[g["pos"] >= 0]
        by_doc = {k: v["pos"].to_numpy(np.int64) for k, v in mk.groupby("id")}
        ids, cleaned, removed = [], [], []
        for did, text in zip(docs["id"].to_numpy(np.int64), docs["text"]):
            toks = text.split(" ")
            p = by_doc.get(did)
            if p is None or not len(toks):
                ids.append(did); cleaned.append(text); removed.append(0)
                continue
            diff = np.zeros(len(toks) + 1, np.int64)
            np.add.at(diff, p, 1)
            np.add.at(diff, np.minimum(p + n_tokens, len(toks)), -1)
            cut = np.cumsum(diff[:-1]) > 0
            kept = [t for t, c in zip(toks, cut) if not c]
            ids.append(did); cleaned.append(" ".join(kept)); removed.append(int(cut.sum()))
        return pd.DataFrame(
            {"id": np.asarray(ids, np.int64), "text_clean": cleaned,
             "n_removed": np.asarray(removed, np.int64)}
        )

    return (
        ds.map_batches(doc_rows, batch_format="pandas")
        .union(mark_rows.map_batches(widen_marks, batch_format="pandas"))
        .groupby("_pkey")
        .map_groups(excise, batch_format="pandas")
    )


# --- exact set-similarity join (prefix-filtered) -----------------------------


def jaccard_pair_join(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    tau: float = 0.5,
    shingle_words: int = 4,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    partitions: int = 64,
) -> ray.data.Dataset:
    """EXACT all-pairs set-similarity join: every document pair whose
    word-``shingle_words``-gram sets have Jaccard ≥ ``tau`` →
    ``ds[(d1, d2, jaccard)]`` with ``d1 < d2`` — the exact tier of the
    dedup family (``minhash_near_dup`` is the probabilistic sibling;
    this one misses NOTHING and is DuckDB-oracle-checkable).

    Prefix filtering (Chaudhuri/Bayardo all-pairs, public) keeps it off
    the naive Σ df² cliff: one gram-keyed exchange annotates each
    (doc, gram) row with the gram's document frequency; one doc-keyed
    exchange sorts each doc's grams by (df, gram) and flags the first
    ``m − ⌈τ·m⌉ + 1`` as the doc's PREFIX (a τ-similar pair must share
    a gram lying in at least one side's prefix — pigeonhole on the
    common order); one more gram-keyed exchange emits probe×index
    candidates where only prefix rows are indexed — globally frequent
    grams sort LAST, so hot grams index (almost) nothing and the
    quadratic blowup never happens. Candidates dedupe on a pair-keyed
    exchange and verify EXACTLY on fetched texts via the size-tiered
    ``items_for_candidates`` + ``attach_pair_payload`` machinery. The
    Jaccard output divides two exact ints (bit-deterministic double)."""
    import pandas as pd

    rows = ds.map_batches(
        lambda t: _shingle_rows(t, text_col, id_col, shingle_words),
        batch_format="pyarrow",
    )

    def route_gram(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_pkey"] = (
            pd.util.hash_array(df["gram"].to_numpy(dtype=object)) % partitions
        ).astype("int32")
        return df

    def annotate_df(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(["id", "gram"])
        g = g.assign(df=g.groupby("gram", sort=False)["id"].transform("size"))
        return g[["id", "gram", "df"]]

    with_df = rows.map_batches(route_gram, batch_format="pandas").groupby(
        "_pkey"
    ).map_groups(annotate_df, batch_format="pandas")

    def route_doc(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_pkey"] = (df["id"].to_numpy(np.int64) % partitions).astype("int32")
        return df

    def flag_prefix(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["id", "df", "gram"], kind="mergesort")
        m = g.groupby("id", sort=False)["gram"].transform("size").to_numpy(np.int64)
        pos = g.groupby("id", sort=False).cumcount().to_numpy(np.int64)
        plen = m - np.ceil(tau * m).astype(np.int64) + 1
        return pd.DataFrame(
            {
                "id": g["id"].to_numpy(np.int64),
                "gram": g["gram"],
                "m": m,
                "pfx": (pos < plen).astype(np.int8),
            }
        )

    flagged = with_df.map_batches(route_doc, batch_format="pandas").groupby(
        "_pkey"
    ).map_groups(flag_prefix, batch_format="pandas")

    def gram_pairs(g: pd.DataFrame) -> pd.DataFrame:
        outs_a, outs_b = [], []
        for _, sub in g.groupby("gram", sort=False):
            idx = sub.loc[sub["pfx"] == 1, "id"].to_numpy(np.int64)
            if len(idx) == 0:
                continue
            probe = sub["id"].to_numpy(np.int64)
            a = np.repeat(probe, len(idx))
            b = np.tile(idx, len(probe))
            keep = a != b
            a, b = a[keep], b[keep]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            outs_a.append(lo)
            outs_b.append(hi)
        if not outs_a:
            return pd.DataFrame(
                {"a": pd.Series([], dtype="int64"), "b": pd.Series([], dtype="int64")}
            )
        out = pd.DataFrame(
            {"a": np.concatenate(outs_a), "b": np.concatenate(outs_b)}
        ).drop_duplicates()
        return out

    cand_raw = (
        flagged.map_batches(route_gram, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(gram_pairs, batch_format="pandas")
    )

    def route_pair(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy(deep=False)
        df["_pkey"] = (
            ((df["a"].to_numpy(np.int64) * 1_000_003) ^ df["b"].to_numpy(np.int64))
            % partitions
        ).astype("int32")
        return df

    from ..util import compact_nonempty

    cand = compact_nonempty(
        cand_raw.map_batches(route_pair, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(lambda g: g.drop_duplicates(["a", "b"])[["a", "b"]],
                    batch_format="pandas")
    ).materialize()

    empty = pa.Table.from_pydict(
        {
            "d1": pa.array([], pa.int64()),
            "d2": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )
    if cand.count() == 0:
        return ray.data.from_arrow(empty)

    texts = items_for_candidates(ds, cand, id_col, [id_col, text_col], cfg)
    enriched = attach_pair_payload(cand, texts, id_col, text_col)

    def _grams(txt: str) -> set[str]:
        # MUST match _shingle_rows / the SQL oracle exactly: split on
        # single space (empties kept), no short-doc special case
        w = (txt or "").split(" ")
        return {" ".join(w[j : j + shingle_words]) for j in range(len(w) - shingle_words + 1)}

    def verify(t: pa.Table) -> pa.Table:
        d1, d2, jac = [], [], []
        for a, b, ta, tb in zip(
            t["a"].to_pylist(), t["b"].to_pylist(),
            t["_pa"].to_pylist(), t["_pb"].to_pylist(),
        ):
            sa = _grams(ta)
            sb = _grams(tb)
            inter = len(sa & sb)
            union = len(sa) + len(sb) - inter
            if union and inter / union >= tau:
                d1.append(a)
                d2.append(b)
                jac.append(inter / union)
        return pa.Table.from_pydict(
            {"d1": d1, "d2": d2, "jaccard": jac}, schema=empty.schema
        )

    return enriched.map_batches(verify, batch_format="pyarrow")


def _shingle_rows(
    t: pa.Table, text_col: str, id_col: str, k: int
) -> pa.Table:
    """(id, gram) distinct rows per batch — word k-gram shingles with the
    SQL-parity tokenization (split on single space, empties kept)."""
    ids, grams = [], []
    for i, txt in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
        w = (txt or "").split(" ")
        for g in {" ".join(w[j : j + k]) for j in range(len(w) - k + 1)}:
            ids.append(i)
            grams.append(g)
    return pa.Table.from_pydict(
        {"id": pa.array(ids, pa.int64()), "gram": pa.array(grams, pa.string())}
    )


# --- incremental dedup against a persisted hash index ------------------------

#: hive buckets in the persisted content-hash index
HASH_INDEX_BUCKETS = 64


def _md5_bucket(md5s: "pd.Series") -> np.ndarray:
    return (
        pd.util.hash_array(md5s.to_numpy(dtype=object)) % HASH_INDEX_BUCKETS
    ).astype(np.int64)


def build_hash_index(
    ds: ray.data.Dataset, text_col: str, id_col: str, out_dir: str
) -> str:
    """Persist the corpus's content-hash index: (md5, id-of-first-owner)
    hive-partitioned by ``bucket = hash(md5) % HASH_INDEX_BUCKETS`` —
    the historical-dedup sidecar a production ingest keeps between
    crawls. ONE exchange builds it (the ``exact_dedup`` plan keyed the
    same way the probes will be); the hive write splits batches across
    bucket dirs with no extra shuffle. Probes then read only the buckets
    their hashes land in (``dedup_against_index``) — a new-batch dedup
    touches |new hashes| buckets, never the whole index."""
    import os
    import shutil

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        md5s = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in df[text_col]]
        out = pd.DataFrame({"md5": md5s, "owner_id": df[id_col].to_numpy(np.int64)})
        out = out.sort_values(["md5", "owner_id"], kind="mergesort").drop_duplicates("md5")
        out["bucket"] = _md5_bucket(out["md5"])
        return _route_col(out, "bucket")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["md5", "owner_id"], kind="mergesort").drop_duplicates("md5")
        return g[["md5", "owner_id", "bucket"]]

    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)
    (
        ds.map_batches(partial, batch_format="pandas", batch_size=4096)
        .groupby("_pkey")
        .map_groups(merge, batch_format="pandas")
        .write_parquet(tmp, partition_cols=["bucket"])
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp, out_dir)
    return out_dir


def _route_col(df: pd.DataFrame, col: str, parts: int = 64) -> pd.DataFrame:
    out = df.copy(deep=False)
    out["_pkey"] = (
        pd.util.hash_array(out[col].to_numpy()) % parts
    ).astype("int32")
    return out


def dedup_against_index(
    new_ds: ray.data.Dataset, text_col: str, id_col: str, index_dir: str
) -> tuple[ray.data.Dataset, list[int]]:
    """Filter a NEW batch against the persisted index: drops docs whose
    content md5 already exists in history, AND exact-dedups the batch
    internally (min id wins). Returns (fresh rows, probed bucket ids).

    Scale shape: the new batch's hashes determine the probed buckets —
    ONLY those hive dirs are read (column-pruned to md5), so deduping a
    daily increment against a 100-TB history reads the touched fraction
    of the index, not the corpus. One co-partitioned anti-join exchange;
    text moves only for surviving rows' own batch lineage."""
    import glob
    import os

    # pass 1: batch-internal exact dedup (min id per distinct text)
    deduped = exact_dedup(new_ds, text_col, id_col).materialize()

    def hash_rows(df: pd.DataFrame) -> pd.DataFrame:
        md5s = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in df[text_col]]
        out = df.assign(_md5=md5s)
        out["bucket"] = _md5_bucket(out["_md5"])
        return out

    hashed = deduped.map_batches(hash_rows, batch_format="pandas").materialize()

    # probed buckets = the distinct buckets of the NEW hashes only
    probe = sorted(
        {
            int(b)
            for part in hashed.map_batches(
                lambda df: pd.DataFrame({"b": df["bucket"].unique()}),
                batch_format="pandas",
            ).take_all()
            for b in [part["b"]]
        }
    )
    files = sorted(
        f
        for b in probe
        for f in glob.glob(os.path.join(index_dir, f"bucket={b}", "*.parquet"))
    )
    if not files:
        return hashed.drop_columns(["_md5", "bucket"]), probe

    idx = ray.data.read_parquet(files, columns=["md5"])

    # anti-join on slim (id, md5) pairs — clean fixed schema both sides
    def mark_new(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"_id": df[id_col].to_numpy(np.int64),
             "_md5": df["_md5"].astype(object)}
        )
        out["_side"] = np.int8(0)
        return _route_col(out, "_md5")

    def mark_idx(df: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame(
            {"_id": np.int64(-1), "_md5": df["md5"].astype(object)}
        )
        out["_side"] = np.int8(1)
        return _route_col(out, "_md5")

    def anti(g: pd.DataFrame) -> pd.DataFrame:
        fresh = g[g["_side"] == 0]
        seen = set(g.loc[g["_side"] == 1, "_md5"])
        if seen:
            fresh = fresh[~fresh["_md5"].isin(seen)]
        return pd.DataFrame(
            {"_id": fresh["_id"].to_numpy(np.int64),
             "_m": np.ones(len(fresh), np.int8)}
        )

    fresh_ids = (
        hashed.map_batches(mark_new, batch_format="pandas")
        .union(idx.map_batches(mark_idx, batch_format="pandas"))
        .groupby("_pkey")
        .map_groups(anti, batch_format="pandas")
    )

    # restore full rows via a co-partitioned semi-join on the id
    from .joins import copartition_attach

    out = copartition_attach(
        deduped, fresh_ids, id_col, "_id", {"_m": "_m"}
    ).drop_columns(["_m"])
    return out, probe
