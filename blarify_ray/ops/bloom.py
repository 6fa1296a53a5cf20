"""Bloom-filter semi-/anti-join — the classic exchange-reduction
primitive for SELECTIVE joins at 100-TB scale.

``copartition_attach`` (ops/joins.py) moves BOTH sides through one
hash exchange. When the join is selective (most left rows have no
match), that wastes the exchange on rows that were never going to
match. A Bloom filter of the right-side keys is blob-scale (MBs for
hundreds of millions of keys), broadcasts once via ``ray.put``, and a
map-only pass drops every left row the filter proves absent BEFORE the
shuffle; only the surviving candidates (true matches + the filter's
false positives) pay exchange cost, and one exact co-partitioned marker
join resolves them. The result is EXACT — false positives are
eliminated by the verify join; false negatives are impossible.

Reference analog: the reference pre-filters reference resolution by an
in-memory symbol table before querying the LSP
(``blarify/code_references/lsp_helper.py``); this is the distributed,
probabilistic-prefilter form. Kirsch–Mitzenmacher double hashing
(h1 + i·h2) gives k index functions from two 64-bit hashes.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ..util import compact_nonempty

#: default filter size: 2^23 bits = 1 MiB packed; ~1% FP at ~870k keys
#: with k=6. Size n_bits ≈ 9.6·n_keys for 1% FP.
DEFAULT_N_BITS = 1 << 23
DEFAULT_K = 6

_MIX = np.uint64(0x9E3779B97F4A7C15)  # golden-ratio odd multiplier


def _hash2(vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Two independent-enough uint64 hash streams per value (the
    Kirsch–Mitzenmacher base pair). Works for int and string arrays."""
    if vals.dtype.kind not in ("i", "u"):
        vals = vals.astype(object)
    h1 = pd.util.hash_array(vals)
    h2 = (h1 * _MIX) ^ (h1 >> np.uint64(32))
    return h1, h2 | np.uint64(1)  # odd → full cycle mod 2^m


def _set_bits(blob: np.ndarray, vals: np.ndarray, n_bits: int, k: int) -> None:
    h1, h2 = _hash2(vals)
    nb = np.uint64(n_bits)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % nb
        np.bitwise_or.at(blob, (idx >> np.uint64(6)).astype(np.int64),
                         np.uint64(1) << (idx & np.uint64(63)))


def might_contain(blob: np.ndarray, vals: np.ndarray, n_bits: int,
                  k: int = DEFAULT_K) -> np.ndarray:
    """Vectorized membership probe → bool mask (no false negatives)."""
    h1, h2 = _hash2(vals)
    nb = np.uint64(n_bits)
    out = np.ones(len(vals), dtype=bool)
    for i in range(k):
        idx = (h1 + np.uint64(i) * h2) % nb
        bit = (blob[(idx >> np.uint64(6)).astype(np.int64)]
               >> (idx & np.uint64(63))) & np.uint64(1)
        out &= bit.astype(bool)
    return out


def build_bloom(keys: ray.data.Dataset, col: str,
                n_bits: int = DEFAULT_N_BITS, k: int = DEFAULT_K) -> np.ndarray:
    """Distributed Bloom build: every batch sets its bits into a local
    blob (one fixed-size binary row per batch), the driver OR-folds the
    blobs STREAMING via ``iter_batches`` — peak driver memory is two
    blobs, never the key set."""
    assert n_bits % 64 == 0

    def partial(t: pa.Table) -> pa.Table:
        blob = np.zeros(n_bits // 64, dtype=np.uint64)
        v = np.asarray(t[col].combine_chunks())
        if len(v):
            _set_bits(blob, v, n_bits, k)
        return pa.Table.from_pydict({"blob": pa.array([blob.tobytes()], pa.binary())})

    acc = np.zeros(n_bits // 64, dtype=np.uint64)
    parts = keys.select_columns([col]).map_batches(partial, batch_format="pyarrow")
    for b in parts.iter_batches(batch_format="pyarrow"):
        for blob in b["blob"].to_pylist():
            acc |= np.frombuffer(blob, dtype=np.uint64)
    return acc


def bloom_semi_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_key: str,
    right_key: str,
    anti: bool = False,
    n_bits: int = DEFAULT_N_BITS,
    k: int = DEFAULT_K,
    partitions: int = 64,
) -> ray.data.Dataset:
    """EXACT semi-join (``anti=False``: left rows whose key exists in
    right) or anti-join (``anti=True``: left rows whose key does NOT),
    with a Bloom prefilter so only candidate rows reach the exchange.

    Scale shape: right keys → blob-scale filter (one streaming OR fold),
    ``ray.put`` once; a map-only pass splits left into definite
    non-members (bloom miss — zero exchange cost; emitted directly for
    anti, dropped for semi) and candidates; ONE co-partitioned marker
    join resolves the candidates exactly. For a 1%-FP-sized filter a
    selective join ships ~(matches + 1% of left) instead of all of left.

    Keys may be int or string; the right side is key-deduplicated
    internally (marker lookups need a unique dimension side)."""
    from .joins import copartition_attach

    blob = build_bloom(right, right_key, n_bits=n_bits, k=k)
    blob_ref = ray.put(blob)

    def prefilter(keep_candidates: bool):
        def f(df: pd.DataFrame) -> pd.DataFrame:
            mask = might_contain(ray.get(blob_ref),
                                 df[left_key].to_numpy(), n_bits, k)
            return df[mask] if keep_candidates else df[~mask]

        return f

    candidates = compact_nonempty(
        left.map_batches(prefilter(True), batch_format="pandas")
    ).materialize()
    if candidates.count() == 0:
        # fully selective: nothing to verify, nothing shuffles at all
        if anti:
            return left.map_batches(prefilter(False), batch_format="pandas")
        return left.limit(0)

    # unique right keys with a marker column (one local + one keyed dedup)
    def local_dedup(df: pd.DataFrame) -> pd.DataFrame:
        out = df[[right_key]].drop_duplicates()
        out["_pk"] = (
            pd.util.hash_array(out[right_key].to_numpy()) % partitions
        ).astype("int32")
        return out

    rkeys = compact_nonempty(
        right.select_columns([right_key])
        .map_batches(local_dedup, batch_format="pandas")
        .groupby("_pk")
        .map_groups(
            lambda g: g.drop_duplicates([right_key])[[right_key]].assign(
                _m=np.int8(1)
            ),
            batch_format="pandas",
        )
    )

    verified = copartition_attach(
        candidates, rkeys, left_key, right_key, {"_m": "_m"},
        partitions=partitions, how="left" if anti else "inner",
    )
    if not anti:
        return verified.drop_columns(["_m"])
    fp_survivors = compact_nonempty(
        verified.map_batches(
            lambda df: df[df["_m"].isna()].drop(columns=["_m"]),
            batch_format="pandas",
        )
    )
    definite = left.map_batches(prefilter(False), batch_format="pandas")
    return definite.union(fp_survivors)
