"""Similarity search over embedding columns (``list<float>``).

- knn_bruteforce: exact cosine top-k — per-batch numpy matmul against a
  broadcast query matrix (the baseline; also the verifier for ANN).
- IvfIndex / knn_ivf: IVF-style ANN — deterministic k-means centroids
  from a driver-side sample, centroid assignment as a map_batches stage,
  search probes only the nprobe nearest centroid partitions. The scale
  path: assignment partitions the corpus once; queries touch a fraction.
- embedding_near_dup: cosine near-duplicate pairs via sign-LSH (random
  hyperplane) blocking + exact cosine verify.

Reference analog: vector similarity search with min-score and top-k
(``blarify/repositories/graph_db_manager/queries.py:2298-2356``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _mat(col) -> np.ndarray:
    return np.array(col.to_pylist(), dtype=np.float64)


def _unit(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=-1, keepdims=True)
    return m / np.where(n == 0, 1, n)


def knn_bruteforce(
    ds: ray.data.Dataset, query_vecs: np.ndarray, k: int, id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> list[list[tuple[int, float]]]:
    """Exact top-k per query: per-batch partial top-k (numpy matmul vs the
    broadcast query matrix), merged on the driver. Only k×n_queries rows
    ever leave a batch."""
    q = _unit(np.atleast_2d(np.asarray(query_vecs, dtype=np.float64)))
    q_ref = ray.put(q)

    def partial(t: pa.Table) -> pa.Table:
        qm = ray.get(q_ref)
        m = _unit(_mat(t[emb_col]))
        sims = m @ qm.T  # (batch, nq)
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        out = {"qi": [], "id": [], "s": []}
        kk = min(k, len(ids))
        for qi in range(qm.shape[0]):
            part = np.argpartition(-sims[:, qi], kk - 1)[:kk]
            for j in part:
                out["qi"].append(qi)
                out["id"].append(int(ids[j]))
                out["s"].append(float(sims[j, qi]))
        return pa.Table.from_pydict(
            out, schema=pa.schema([("qi", pa.int32()), ("id", pa.int64()), ("s", pa.float64())])
        )

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    per_q: list[list[tuple[int, float]]] = [[] for _ in range(q.shape[0])]
    for r in rows:
        per_q[r["qi"]].append((r["id"], r["s"]))
    return [
        sorted(lst, key=lambda t: (-t[1], t[0]))[:k] for lst in per_q
    ]


class IvfIndex:
    """Deterministic IVF: k-means over a seeded sample, run on the driver
    (sample-sized); assignment + search are distributed stages."""

    def __init__(self, centroids: np.ndarray):
        self.centroids = _unit(centroids)

    @classmethod
    def train(
        cls, ds: ray.data.Dataset, n_centroids: int, emb_col: str = "embedding",
        sample_n: int = 4096, iters: int = 10, seed: int = 7,
    ) -> "IvfIndex":
        sample = ds.random_sample(1.0, seed=seed).limit(sample_n).take_all()
        m = _unit(np.array([r[emb_col] for r in sample], dtype=np.float64))
        rng = np.random.RandomState(seed)
        cent = m[rng.choice(len(m), size=min(n_centroids, len(m)), replace=False)]
        for _ in range(iters):
            assign = np.argmax(m @ cent.T, axis=1)
            for c in range(cent.shape[0]):
                members = m[assign == c]
                if len(members):
                    cent[c] = members.mean(axis=0)
            cent = _unit(cent)
        return cls(cent)

    def assign(self, ds: ray.data.Dataset, emb_col: str = "embedding") -> ray.data.Dataset:
        cent_ref = ray.put(self.centroids)

        def a(t: pa.Table) -> pa.Table:
            cent = ray.get(cent_ref)
            m = _unit(_mat(t[emb_col]))
            return t.append_column(
                "centroid", pa.array(np.argmax(m @ cent.T, axis=1).astype(np.int32))
            )

        return ds.map_batches(a, batch_format="pyarrow")

    def search(
        self, assigned: ray.data.Dataset, query_vec: np.ndarray, k: int,
        nprobe: int = 4, id_col: str = "vec_id", emb_col: str = "embedding",
    ) -> list[tuple[int, float]]:
        q = _unit(np.asarray(query_vec, dtype=np.float64))
        probes = set(
            int(i) for i in np.argsort(-(self.centroids @ q))[:nprobe]
        )

        def flt(t: pa.Table) -> pa.Table:
            mask = pa.array([c in probes for c in t["centroid"].to_pylist()])
            return t.filter(mask)

        filtered = assigned.map_batches(flt, batch_format="pyarrow")
        return knn_bruteforce(filtered, q[None, :], k, id_col=id_col, emb_col=emb_col)[0]


def embedding_near_dup(
    ds: ray.data.Dataset, threshold: float = 0.9, n_planes: int = 16, n_bands: int = 4,
    id_col: str = "vec_id", emb_col: str = "embedding", dim: int | None = None, seed: int = 11,
) -> ray.data.Dataset:
    """Cosine-similar pairs (a < b, cos ≥ threshold) via sign-LSH
    blocking: n_planes random hyperplanes → sign bits → bands; pairs
    sharing a band get exact verification."""
    first = ds.take(1)
    d = dim or len(first[0][emb_col])
    rng = np.random.RandomState(seed)
    planes = rng.randn(d, n_planes)
    planes_ref = ray.put(planes)
    bits_per_band = n_planes // n_bands

    def band_rows(t: pa.Table) -> pa.Table:
        pl = ray.get(planes_ref)
        m = _unit(_mat(t[emb_col]))
        signs = (m @ pl) > 0  # (n, planes)
        ids = t[id_col].to_pylist()
        vecs = t[emb_col].to_pylist()
        out = {"band_id": [], "band_val": [], "id": [], "vec": []}
        for i in range(len(ids)):
            for b in range(n_bands):
                val = 0
                for j in range(bits_per_band):
                    val = (val << 1) | int(signs[i, b * bits_per_band + j])
                out["band_id"].append(b)
                out["band_val"].append(val)
                out["id"].append(ids[i])
                out["vec"].append(vecs[i])
        return pa.Table.from_pydict(
            out,
            schema=pa.schema(
                [("band_id", pa.int32()), ("band_val", pa.int32()), ("id", pa.int64()),
                 ("vec", pa.list_(pa.float32()))]
            ),
        )

    def verify(g: pa.Table) -> pa.Table:
        ids = g["id"].to_pylist()
        out = {"a": [], "b": [], "cos": []}
        if len(ids) >= 2:
            m = _unit(np.array(g["vec"].to_pylist(), dtype=np.float64))
            order = sorted(range(len(ids)), key=lambda i: ids[i])
            for x in range(len(order)):
                for y in range(x + 1, len(order)):
                    ia, ib = order[x], order[y]
                    if ids[ia] == ids[ib]:
                        continue
                    c = float(m[ia] @ m[ib])
                    if c >= threshold:
                        out["a"].append(ids[ia])
                        out["b"].append(ids[ib])
                        out["cos"].append(round(c, 6))
        return pa.Table.from_pydict(
            out, schema=pa.schema([("a", pa.int64()), ("b", pa.int64()), ("cos", pa.float64())])
        )

    pairs = (
        ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby(["band_id", "band_val"])
        .map_groups(verify, batch_format="pyarrow")
    )
    return pairs.groupby(["a", "b"]).max("cos").map_batches(
        lambda t: pa.Table.from_pydict({"a": t["a"], "b": t["b"], "cos": t["max(cos)"]}),
        batch_format="pyarrow",
    )
