"""Deduplication operators for training-data pipelines.

- exact_dedup            content-hash groupby, keep min-id row
- minhash_near_dup       word-shingle MinHash + LSH banding → candidate
                         pairs → exact n-gram Jaccard verify → union-find
                         clusters → survivors
- simhash_near_dup       64-bit SimHash + 16-bit band blocking → Hamming
                         verify
- (embedding cosine near-dup lives in ops/similarity.py)

All follow the partial/blocked pattern: per-batch vectorized signature
computation (stateless or actor pool), then ONE groupby shuffle on the
blocking key, then a small verify stage. Hash-partition blocking keys,
never all-pairs. Reference analog: the content-hash→embed-once
aggregate (``blarify/services/embedding_service.py:97-144``) and the
SCIP symbol blocking join (``scip_helper.py:875-923``).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..minhash import band_hashes, make_perms, minhash_signature


def exact_dedup(ds: ray.data.Dataset, text_col: str, id_col: str) -> ray.data.Dataset:
    """Keep exactly one row (min id) per distinct text. Exact dedup =
    hash → groupby(hash) → first (the guide-blessed pattern)."""

    def h(t: pa.Table) -> pa.Table:
        md5s = [hashlib.md5(x.encode("utf-8")).hexdigest() for x in t[text_col].to_pylist()]
        return t.append_column("_md5", pa.array(md5s, pa.string()))

    def first(g: pa.Table) -> pa.Table:
        i = pc.index(g[id_col], pc.min(g[id_col])).as_py()
        return g.slice(i, 1).drop_columns(["_md5"])

    return ds.map_batches(h, batch_format="pyarrow").groupby("_md5").map_groups(
        first, batch_format="pyarrow"
    )


def _word_shingles(text: str, k: int) -> set[str]:
    toks = text.split()
    if len(toks) < k:
        return {" ".join(toks)} if toks else set()
    return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}


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
    minimum). Pipeline: signature (map_batches) → explode band rows →
    groupby(band_id, band_hash) → verified pairs → min-label clusters.
    """
    perms = make_perms(cfg.minhash_perms, seed="blarify-ray:docdedup")

    def sig_rows(t: pa.Table) -> pa.Table:
        out = {"band_id": [], "band_hash": [], "id": [], "text": []}
        a, b = perms
        for i, text in zip(t[id_col].to_pylist(), t[text_col].to_pylist()):
            sh = _word_shingles(text, shingle_words)
            sig = minhash_signature(sh, a, b)
            for band_id, bh in enumerate(band_hashes(sig, cfg.lsh_bands)):
                out["band_id"].append(band_id)
                out["band_hash"].append(bh)
                out["id"].append(i)
                out["text"].append(text)
        return pa.Table.from_pydict(
            out,
            schema=pa.schema(
                [("band_id", pa.int32()), ("band_hash", pa.uint64()), ("id", pa.int64()), ("text", pa.string())]
            ),
        )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        ids = g["id"].to_pylist()
        out = {"a": [], "b": []}
        if len(ids) >= 2:
            texts = g["text"].to_pylist()
            order = sorted(range(len(ids)), key=lambda i: ids[i])
            sh = [_word_shingles(texts[i], shingle_words) for i in order]
            for x in range(len(order)):
                for y in range(x + 1, len(order)):
                    inter = len(sh[x] & sh[y])
                    union = len(sh[x]) + len(sh[y]) - inter
                    if union and inter / union >= jaccard_threshold:
                        out["a"].append(ids[order[x]])
                        out["b"].append(ids[order[y]])
        return pa.Table.from_pydict(
            out, schema=pa.schema([("a", pa.int64()), ("b", pa.int64())])
        )

    pairs = (
        ds.map_batches(sig_rows, batch_format="pyarrow")
        .groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )
    # dedup pairs discovered via several bands, then min-label clusters.
    pdf = pairs.to_pandas().drop_duplicates()
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
    rows = sorted((x, find(x)) for x in parent if find(x) != x)
    tbl = pa.Table.from_pydict(
        {
            "id": pa.array([r[0] for r in rows], pa.int64()),
            "dup_of": pa.array([r[1] for r in rows], pa.int64()),
        }
    )
    return ray.data.from_arrow(tbl)


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
    ds: ray.data.Dataset, text_col: str, id_col: str, max_hamming: int = 3
) -> ray.data.Dataset:
    """→ ds[(a, b, hamming)] pairs with Hamming distance ≤ max_hamming.
    Blocking: 4 × 16-bit bands (pigeonhole: any pair within distance 3
    shares at least one exact band)."""
    sigs = simhash_docs(ds, text_col, id_col)

    def band_rows(t: pa.Table) -> pa.Table:
        out = {"band_id": [], "band_val": [], "id": [], "simhash": []}
        for i, h in zip(t["id"].to_pylist(), t["simhash"].to_pylist()):
            for b in range(4):
                out["band_id"].append(b)
                out["band_val"].append((h >> (16 * b)) & 0xFFFF)
                out["id"].append(i)
                out["simhash"].append(h)
        return pa.Table.from_pydict(
            out,
            schema=pa.schema(
                [("band_id", pa.int32()), ("band_val", pa.int32()), ("id", pa.int64()), ("simhash", pa.uint64())]
            ),
        )

    def verify(g: pa.Table) -> pa.Table:
        ids = g["id"].to_pylist()
        out = {"a": [], "b": [], "hamming": []}
        if len(ids) >= 2:
            hs = g["simhash"].to_pylist()
            order = sorted(range(len(ids)), key=lambda i: ids[i])
            for x in range(len(order)):
                for y in range(x + 1, len(order)):
                    ia, ib = order[x], order[y]
                    if ids[ia] == ids[ib]:
                        continue
                    d = bin(hs[ia] ^ hs[ib]).count("1")
                    if d <= max_hamming:
                        out["a"].append(ids[ia])
                        out["b"].append(ids[ib])
                        out["hamming"].append(d)
        return pa.Table.from_pydict(
            out, schema=pa.schema([("a", pa.int64()), ("b", pa.int64()), ("hamming", pa.int64())])
        )

    pairs = (
        sigs.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band_id", "band_val"])
        .map_groups(verify, batch_format="pyarrow")
    )
    # a pair can surface from several bands — global dedup via groupby
    return pairs.groupby(["a", "b"]).min("hamming").map_batches(
        lambda t: pa.Table.from_pydict(
            {"a": t["a"], "b": t["b"], "hamming": t["min(hamming)"]}
        ),
        batch_format="pyarrow",
    )
