"""Mergeable sketches — the partial/combine pattern for metrics at scale
(SURVEY.md §2.6: approximate distinct as metrics, never semantics).

HyperLogLog: each ``map_batches`` call emits ONE serialized register
array; a tiny final stage merges them (element-wise max) — the shuffle
moves p=2^b registers per batch instead of the raw keys.
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
