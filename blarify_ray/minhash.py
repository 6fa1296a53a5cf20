"""MinHash signatures + LSH banding, shared by the serial golden and the
distributed canonicalization stage so candidate-pair generation is
bit-identical on both paths.

Universal hashing h_i(x) = (a_i·x + b_i) mod p over stable 32-bit shingle
hashes, p = 2^31−1, so a_i·x + b_i < 2^62 and the whole signature matrix
is a single vectorized uint64 numpy expression. Constants derive from a
fixed seed (never Python's salted ``hash()``).
"""

from __future__ import annotations

import hashlib
import random

import numpy as np

_P = (1 << 31) - 1  # Mersenne prime 2^31-1


def make_perms(n_perms: int, seed: str = "blarify-ray:minhash") -> tuple[np.ndarray, np.ndarray]:
    rng = random.Random(seed)
    a = np.array([rng.randrange(1, _P) for _ in range(n_perms)], dtype=np.uint64)
    b = np.array([rng.randrange(0, _P) for _ in range(n_perms)], dtype=np.uint64)
    return a, b


def shingle_hash32(s: str) -> int:
    """Deterministic 32-bit hash of a shingle."""
    return int.from_bytes(hashlib.md5(s.encode("utf-8")).digest()[:4], "big") % _P


def shingle_codes(s: str, k: int) -> np.ndarray:
    """Vectorized char-k-shingle codes of the padded string ``^s$``:
    positional byte encoding (exact, collision-free for k ≤ 4 on ASCII
    norms) — one numpy expression instead of one md5 per shingle."""
    arr = np.frombuffer(f"^{s}$".encode("utf-8"), dtype=np.uint8)
    if len(arr) <= k:
        v = 0
        for c in arr:
            v = v * 256 + int(c)
        return np.array([v % _P], dtype=np.uint64)
    from numpy.lib.stride_tricks import sliding_window_view

    w = sliding_window_view(arr, k).astype(np.uint64)
    mult = (256 ** np.arange(k - 1, -1, -1)).astype(np.uint64)
    return (w * mult).sum(axis=1) % _P


def signature_for(s: str, k: int, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signature of a normalized surface string — the shared
    primitive of the serial spec and the distributed stage (bit-identical
    by construction)."""
    xs = shingle_codes(s, k)
    m = (a[:, None] * xs[None, :] + b[:, None]) % _P
    return m.min(axis=1)


def minhash_signature(shingles: set[str], a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """uint64 signature of length n_perms. Empty set → all-max sentinel."""
    if not shingles:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    xs = np.array([shingle_hash32(s) for s in sorted(shingles)], dtype=np.uint64)
    # (n_perms, n_shingles): a[:,None]*xs + b[:,None] < 2^62 — no overflow
    m = (a[:, None] * xs[None, :] + b[:, None]) % _P
    return m.min(axis=1)


def signatures_batch(keys: list[str], k: int, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """MinHash signatures for a BATCH of normalized strings in one numpy
    pass — bit-identical to calling ``signature_for`` per key, but the
    (a·x+b) mod p sweep and the per-key min run over the concatenated
    shingle-code array (``np.minimum.reduceat``) instead of one small
    matrix per key. → (n_keys, n_perms) uint64."""
    if not keys:
        return np.zeros((0, len(a)), dtype=np.uint64)
    # chunked so the (n_perms × total_shingles) sweep stays cache-sized
    # instead of allocating multi-hundred-MB intermediates
    chunk = 2048
    outs = []
    for lo in range(0, len(keys), chunk):
        part = keys[lo : lo + chunk]
        codes = [shingle_codes(s, k) for s in part]
        lens = np.fromiter((len(c) for c in codes), dtype=np.int64, count=len(codes))
        flat = np.concatenate(codes)
        starts = np.zeros(len(codes), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        # (n_perms, total_shingles) — a_i·x + b_i < 2^62, no overflow
        m = (a[:, None] * flat[None, :] + b[:, None]) % _P
        # per-key min along the flat axis for every perm
        outs.append(np.minimum.reduceat(m, starts, axis=1).T)
    return np.ascontiguousarray(np.concatenate(outs, axis=0))


_FNV_OFFSET = np.uint64(1469598103934665603)
_FNV_PRIME = np.uint64(1099511628211)
_BAND_SALT = np.uint64(0x9E3779B97F4A7C15)


def band_hashes(sig: np.ndarray, n_bands: int) -> list[int]:
    """Split the signature into n_bands equal bands; each band → a stable
    63-bit hash (vectorized FNV-style mixing — one numpy expression, not
    one md5 per band). A shared (band_id, band_hash) puts two keys in
    the same LSH bucket."""
    rows = len(sig) // n_bands
    m = np.ascontiguousarray(sig[: n_bands * rows]).reshape(n_bands, rows)
    acc = np.full(n_bands, _FNV_OFFSET, dtype=np.uint64)
    for c in range(rows):
        acc = (acc ^ m[:, c]) * _FNV_PRIME
    acc = acc ^ (np.arange(n_bands, dtype=np.uint64) * _BAND_SALT)
    return (acc >> np.uint64(1)).tolist()


def band_hashes_batch(sigs: np.ndarray, n_bands: int) -> np.ndarray:
    """``band_hashes`` for a (n_keys, n_perms) signature matrix in one
    numpy pass — bit-identical per row. → (n_keys, n_bands) uint64."""
    n_keys, n_perms = sigs.shape
    rows = n_perms // n_bands
    m = np.ascontiguousarray(sigs[:, : n_bands * rows]).reshape(n_keys, n_bands, rows)
    acc = np.full((n_keys, n_bands), _FNV_OFFSET, dtype=np.uint64)
    for c in range(rows):
        acc = (acc ^ m[:, :, c]) * _FNV_PRIME
    acc = acc ^ (np.arange(n_bands, dtype=np.uint64) * _BAND_SALT)[None, :]
    return acc >> np.uint64(1)
