"""Mergeable sketches — the partial/combine pattern for metrics at scale
(SURVEY.md §2.6: approximate distinct as metrics, never semantics).

HyperLogLog: each ``map_batches`` call emits ONE serialized register
array; a tiny final stage merges them (element-wise max) — the shuffle
moves p=2^b registers per batch instead of the raw keys.

QuantileSketch: a KLL-style compactor hierarchy (Karnin-Lang-Liberty,
FOCS'16 — public) with DETERMINISTIC compaction (always promote the
odd-indexed half of the sorted buffer; an odd leftover stays at its
level so total weight is exact). Each batch emits one ~k·log(n/k)-value
blob; merging is level-wise concat + the same compaction. Deterministic
compaction trades the randomized variant's unbiasedness for exact
reproducibility (same data → same sketch on every run and tier), with
rank error still O(log²(n/k)/k) — metrics-grade, never semantics.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data


class HLL:
    """Plain HyperLogLog with 2^b registers (b=12 → σ ≈ 1.6 %)."""

    def __init__(self, b: int = 12, registers: np.ndarray | None = None):
        self.b = b
        self.m = 1 << b
        self.reg = registers if registers is not None else np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hs: np.ndarray) -> None:
        idx = (hs >> np.uint64(64 - self.b)).astype(np.int64)
        rest = (hs << np.uint64(self.b)) | np.uint64(1 << (self.b - 1))
        # rank = leading zeros of the remaining bits + 1, via bit length
        lz = np.zeros(len(hs), dtype=np.uint8)
        v = rest.copy()
        for shift in (32, 16, 8, 4, 2, 1):
            mask = v < (np.uint64(1) << np.uint64(64 - shift))
            lz[mask] += shift
            v[mask] = v[mask] << np.uint64(shift)
        np.maximum.at(self.reg, idx, lz + 1)

    def merge(self, other: "HLL") -> "HLL":
        return HLL(self.b, np.maximum(self.reg, other.reg))

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1 + 1.079 / m)
        s = float(np.sum(2.0 ** (-self.reg.astype(np.float64))))
        e = alpha * m * m / s
        zeros = int(np.count_nonzero(self.reg == 0))
        if e <= 2.5 * m and zeros:
            return m * np.log(m / zeros)  # small-range correction
        return e


def _hash64(values: list) -> np.ndarray:
    return np.array(
        [
            int.from_bytes(hashlib.md5(str(v).encode("utf-8")).digest()[:8], "big")
            for v in values
        ],
        dtype=np.uint64,
    )


class QuantileSketch:
    """Mergeable quantile sketch over float64 values.

    ``levels[i]`` holds values of weight ``2**i``; a level over capacity
    ``k`` is sorted and its odd-indexed half promoted one level up
    (weight doubles, count halves — weight-exact, deterministic)."""

    def __init__(self, k: int = 256, levels: list[np.ndarray] | None = None):
        self.k = k
        self.levels: list[np.ndarray] = (
            levels if levels is not None else [np.empty(0, np.float64)]
        )

    def add(self, vals: np.ndarray) -> None:
        self.levels[0] = np.concatenate([self.levels[0], vals.astype(np.float64)])
        self._compress()

    def _compress(self) -> None:
        i = 0
        while i < len(self.levels):
            buf = self.levels[i]
            if len(buf) > self.k:
                v = np.sort(buf, kind="stable")
                if len(v) % 2:  # odd leftover keeps its level — exact weight
                    self.levels[i], v = v[-1:], v[:-1]
                else:
                    self.levels[i] = np.empty(0, np.float64)
                if i + 1 == len(self.levels):
                    self.levels.append(np.empty(0, np.float64))
                self.levels[i + 1] = np.concatenate([self.levels[i + 1], v[1::2]])
            i += 1

    def merge(self, other: "QuantileSketch") -> "QuantileSketch":
        n = max(len(self.levels), len(other.levels))

        def lv(s, i):
            return s.levels[i] if i < len(s.levels) else np.empty(0, np.float64)

        merged = QuantileSketch(
            self.k, [np.concatenate([lv(self, i), lv(other, i)]) for i in range(n)]
        )
        merged._compress()
        return merged

    def total_weight(self) -> int:
        return int(sum(len(b) << i for i, b in enumerate(self.levels)))

    def quantile(self, q: float) -> float:
        vals = np.concatenate(self.levels)
        if not len(vals):
            return float("nan")
        w = np.concatenate(
            [np.full(len(b), 1 << i, np.int64) for i, b in enumerate(self.levels)]
        )
        srt = np.argsort(vals, kind="stable")
        vals, w = vals[srt], w[srt]
        cum = np.cumsum(w)
        rank = q * (cum[-1] - 1)
        return float(vals[np.searchsorted(cum, rank, side="right")])

    def serialize(self) -> bytes:
        import struct

        head = struct.pack("<ii", self.k, len(self.levels))
        lens = struct.pack(f"<{len(self.levels)}i", *[len(b) for b in self.levels])
        return head + lens + np.concatenate(self.levels).tobytes()

    @classmethod
    def deserialize(cls, blob: bytes) -> "QuantileSketch":
        import struct

        k, nlev = struct.unpack_from("<ii", blob, 0)
        lens = struct.unpack_from(f"<{nlev}i", blob, 8)
        flat = np.frombuffer(blob, dtype=np.float64, offset=8 + 4 * nlev).copy()
        levels, pos = [], 0
        for ln in lens:
            levels.append(flat[pos : pos + ln])
            pos += ln
        return cls(k, levels)


def approx_quantiles(
    ds: ray.data.Dataset, col: str, qs: list[float], k: int = 256
) -> dict[float, float]:
    """Approximate quantiles of ``col``: one KLL blob per batch (a few
    KiB — k·log(batch/k) float64s), merged on the driver. The raw column
    never leaves the workers; the shuffle is blob-scale, exactly the HLL
    pattern."""

    def sketch(t: pa.Table) -> pa.Table:
        s = QuantileSketch(k)
        s.add(np.asarray(t[col].combine_chunks(), dtype=np.float64))
        return pa.Table.from_pydict({"blob": pa.array([s.serialize()], pa.binary())})

    blobs = ds.map_batches(sketch, batch_format="pyarrow", batch_size=65536).take_all()
    acc = QuantileSketch(k)
    for r in blobs:
        acc = acc.merge(QuantileSketch.deserialize(r["blob"]))
    return {q: acc.quantile(q) for q in qs}


def grouped_quantiles(
    ds: ray.data.Dataset,
    key_col: str,
    val_col: str,
    qs: list[float],
    k: int = 256,
    partitions: int = 64,
) -> ray.data.Dataset:
    """Per-key approximate quantiles: each batch emits one serialized
    KLL sketch PER KEY present in the batch (key-scale blob rows, never
    the raw values), one key-routed exchange merges each key's blobs,
    and the output is one row per key with a column per requested
    quantile. The grouped form of ``approx_quantiles`` — same sketch,
    same determinism."""
    import pandas as pd

    qcols = [f"p{int(q * 100)}" for q in qs]

    def sketch_partial(df: pd.DataFrame) -> pd.DataFrame:
        out_k, out_b = [], []
        for key, vals in df.groupby(key_col, sort=False)[val_col]:
            s = QuantileSketch(k)
            s.add(vals.to_numpy(np.float64))
            out_k.append(key)
            out_b.append(s.serialize())
        g = pd.DataFrame({key_col: out_k, "blob": out_b})
        g["_pkey"] = (
            pd.util.hash_array(g[key_col].to_numpy()) % partitions
        ).astype("int32")
        return g

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        rows: dict = {key_col: []}
        for c in qcols:
            rows[c] = []
        for key, blobs in g.groupby(key_col, sort=True)["blob"]:
            acc = QuantileSketch(k)
            for b in blobs:
                acc = acc.merge(QuantileSketch.deserialize(b))
            rows[key_col].append(key)
            for q, c in zip(qs, qcols):
                rows[c].append(acc.quantile(q))
        return pd.DataFrame(rows)

    return (
        ds.map_batches(sketch_partial, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(merge, batch_format="pandas")
    )


class HeavyHitters:
    """Misra–Gries summary with ``k`` counters (Misra & Gries 1982,
    public): after any stream/merge sequence, every item with true count
    > n/k survives, and each kept counter undercounts its item by at
    most ``self.err`` (the accumulated decrement). Deterministic —
    merging is counter addition followed by the (k+1)-th-largest
    decrement rule."""

    def __init__(self, k: int = 256, counts: dict | None = None, err: int = 0):
        self.k = k
        self.counts: dict = counts or {}
        self.err = err

    def _shrink(self) -> None:
        if len(self.counts) <= self.k:
            return
        vals = sorted(self.counts.values(), reverse=True)
        dec = vals[self.k]  # (k+1)-th largest: decrementing by it keeps ≤ k
        self.counts = {w: c - dec for w, c in self.counts.items() if c > dec}
        self.err += dec

    def add_counts(self, items, ns) -> None:
        for w, n in zip(items, ns):
            self.counts[w] = self.counts.get(w, 0) + int(n)
        self._shrink()

    def merge(self, other: "HeavyHitters") -> "HeavyHitters":
        out = HeavyHitters(self.k, dict(self.counts), self.err + other.err)
        for w, c in other.counts.items():
            out.counts[w] = out.counts.get(w, 0) + c
        out._shrink()
        return out

    def top(self, n: int) -> list[tuple[str, int, int]]:
        """→ [(item, count_lo, count_hi)]: true count ∈ [lo, hi]."""
        items = sorted(self.counts.items(), key=lambda kv: (-kv[1], kv[0]))[:n]
        return [(w, c, c + self.err) for w, c in items]


def heavy_hitter_words(
    ds: ray.data.Dataset, text_col: str, n: int = 50, k: int = 4096
) -> list[tuple[str, int, int]]:
    """Approximate top-n words by frequency: each batch computes EXACT
    vectorized word counts (error-free Misra–Gries input) and emits one
    truncated summary blob; the driver merges batch-count many blobs.
    Unlike the exact ``word_topk`` (one vocab-keyed shuffle), this never
    shuffles at all — the sketch pattern for dashboard-grade top-k."""
    import json

    def sketch(t: pa.Table) -> pa.Table:
        import pandas as pd

        vc = pd.Series(t[text_col].to_pylist()).str.split(" ").explode().value_counts()
        hh = HeavyHitters(k)
        hh.add_counts(vc.index.tolist(), vc.to_numpy())
        blob = json.dumps({"c": hh.counts, "e": hh.err})
        return pa.Table.from_pydict({"blob": pa.array([blob], pa.string())})

    blobs = ds.map_batches(sketch, batch_format="pyarrow").take_all()
    acc = HeavyHitters(k)
    for r in blobs:
        d = json.loads(r["blob"])
        acc = acc.merge(HeavyHitters(k, d["c"], d["e"]))
    return acc.top(n)


def approx_distinct(ds: ray.data.Dataset, col: str, b: int = 12) -> float:
    """Approximate COUNT(DISTINCT col): one HLL register blob per batch,
    merged on the driver (blobs are 4 KiB each)."""

    def sketch(t: pa.Table) -> pa.Table:
        h = HLL(b)
        h.add_hashes(_hash64(t[col].to_pylist()))
        return pa.Table.from_pydict({"reg": pa.array([h.reg.tobytes()], pa.binary())})

    blobs = ds.map_batches(sketch, batch_format="pyarrow", batch_size=65536).take_all()
    acc = HLL(b)
    for r in blobs:
        acc = acc.merge(HLL(b, np.frombuffer(r["reg"], dtype=np.uint8).copy()))
    return acc.estimate()


def grouped_distinct(
    ds: ray.data.Dataset,
    key_col: str,
    val_col: str,
    b: int = 12,
    partitions: int = 64,
) -> ray.data.Dataset:
    """Per-key approximate distinct count (grouped HLL): each batch emits
    one 2^b-byte register blob PER KEY present, one key-routed exchange
    max-merges each key's blobs, output is ``(key, approx_distinct)`` —
    the grouped sibling of the scalar HLL path and of
    ``grouped_quantiles``. Blob-scale shuffle; raw values never move.
    Metrics, never semantics (σ ≈ 1.04/√2^b per key)."""
    import pandas as pd

    def sketch_partial(df: pd.DataFrame) -> pd.DataFrame:
        out_k, out_b = [], []
        for key, vals in df.groupby(key_col, sort=False)[val_col]:
            h = HLL(b)
            h.add_hashes(_hash64(vals.tolist()))
            out_k.append(key)
            out_b.append(h.reg.tobytes())
        g = pd.DataFrame({key_col: out_k, "blob": out_b})
        g["_pkey"] = (
            pd.util.hash_array(g[key_col].to_numpy()) % partitions
        ).astype("int32")
        return g

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        keys, ests = [], []
        for key, blobs in g.groupby(key_col, sort=True)["blob"]:
            reg = np.zeros(1 << b, np.uint8)
            for blob in blobs:
                reg = np.maximum(reg, np.frombuffer(blob, np.uint8))
            keys.append(key)
            ests.append(HLL(b, reg).estimate())
        return pd.DataFrame({key_col: keys, "approx_distinct": ests})

    return (
        ds.map_batches(sketch_partial, batch_format="pandas")
        .groupby("_pkey")
        .map_groups(merge, batch_format="pandas")
    )


class BloomFilter:
    """Blocked Bloom filter over 64-bit md5-derived hashes — the
    no-false-negative membership sketch the incremental-dedup /
    decontamination path wants when the reference set outgrows a
    broadcastable Python set (a 10¹⁰-key history at 10 bits/key is
    ~12 GB of BITS vs hundreds of GB of strings).

    ``k`` probe positions are derived double-hash style
    (Kirsch–Mitzenmacher 2006, public): ``pos_i = h1 + i·h2 mod m`` —
    one 64-bit hash per key total, split into two 32-bit halves.
    Deterministic: same keys → same bits on every run and tier.

    Scale shape (the HLL pattern, bigger blob): every ``map_batches``
    partial emits ONE packed uint64 bit array; merging is elementwise
    OR — associative, commutative, idempotent, so duplicate partials
    from task retries are harmless. Driver state = the filter itself
    (m/8 bytes, independent of corpus size). Beyond driver-RAM filter
    sizes, split the bit space by hash prefix into a hive layout and
    OR/probe per shard (the ``edges_by_dst`` pattern) — the probe side
    stays map-only either way."""

    __slots__ = ("m", "k", "bits")

    def __init__(self, n_bits: int = 1 << 20, k: int = 7, bits: np.ndarray | None = None):
        assert n_bits % 64 == 0
        self.m = n_bits
        self.k = k
        self.bits = bits if bits is not None else np.zeros(n_bits // 64, dtype=np.uint64)

    def _positions(self, hs: np.ndarray) -> np.ndarray:
        """(len(hs), k) probe positions from one 64-bit hash per key."""
        h1 = (hs >> np.uint64(32)).astype(np.uint64)
        h2 = (hs & np.uint64(0xFFFFFFFF)) | np.uint64(1)  # odd → full cycle
        i = np.arange(self.k, dtype=np.uint64)[None, :]
        return ((h1[:, None] + i * h2[:, None]) % np.uint64(self.m)).astype(np.int64)

    def add_hashes(self, hs: np.ndarray) -> None:
        pos = self._positions(hs).ravel()
        np.bitwise_or.at(
            self.bits, pos >> 6, np.uint64(1) << (pos.astype(np.uint64) & np.uint64(63))
        )

    def contains_hashes(self, hs: np.ndarray) -> np.ndarray:
        if not len(hs):
            return np.zeros(0, dtype=bool)
        pos = self._positions(hs)
        got = (self.bits[pos >> 6] >> (pos.astype(np.uint64) & np.uint64(63))) & np.uint64(1)
        return got.all(axis=1)

    def add(self, values: list) -> None:
        self.add_hashes(_hash64(values))

    def contains(self, values: list) -> np.ndarray:
        return self.contains_hashes(_hash64(values))

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.m == other.m and self.k == other.k
        return BloomFilter(self.m, self.k, self.bits | other.bits)

    def fill_ratio(self) -> float:
        return float(np.unpackbits(self.bits.view(np.uint8)).mean())

    def serialize(self) -> bytes:
        return self.bits.tobytes()

    @classmethod
    def deserialize(cls, blob: bytes, n_bits: int, k: int) -> "BloomFilter":
        return cls(n_bits, k, np.frombuffer(blob, dtype=np.uint64).copy())


def bloom_build(
    ds: ray.data.Dataset, col: str, n_bits: int = 1 << 20, k: int = 7
) -> BloomFilter:
    """Distributed build: per-batch bit-array partials, OR-fold on the
    driver (constant driver state = the filter; rows never shuffle)."""

    def partial(t: pa.Table) -> pa.Table:
        f = BloomFilter(n_bits, k)
        f.add(t[col].to_pylist())
        return pa.Table.from_pydict({"blob": pa.array([f.serialize()], pa.binary())})

    out = BloomFilter(n_bits, k)
    for row in ds.map_batches(partial, batch_format="pyarrow").take_all():
        out = out.merge(BloomFilter.deserialize(row["blob"], n_bits, k))
    return out


def bloom_probe(
    ds: ray.data.Dataset, col: str, bloom: BloomFilter, flag_col: str = "maybe_member"
) -> ray.data.Dataset:
    """Map-only membership probe: broadcast the filter once (``ray.put``),
    flag each row. NO false negatives (a true member always flags);
    false-positive rate ≈ (1 - e^{-kn/m})^k — size m accordingly. The
    decontamination / incremental-dedup pre-filter: rows flagged False
    skip the exact (expensive) membership check entirely."""
    import ray as _ray

    from ..util import get_broadcast

    blob_ref = _ray.put(bloom.serialize())
    n_bits, k = bloom.m, bloom.k

    def probe(t: pa.Table) -> pa.Table:
        # zero-copy read-only view over the worker-cached broadcast bytes
        # (get_broadcast caches per worker; no per-batch deserialization)
        f = BloomFilter(
            n_bits, k, np.frombuffer(get_broadcast(blob_ref), dtype=np.uint64)
        )
        return t.append_column(flag_col, pa.array(f.contains(t[col].to_pylist())))

    return ds.map_batches(probe, batch_format="pyarrow")
