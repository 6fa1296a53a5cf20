"""Similarity search over embedding columns (``list<float>``).

- knn_bruteforce: exact cosine top-k — per-batch numpy matmul against a
  broadcast query matrix (the baseline; also the verifier for ANN).
- IvfIndex / knn_ivf: IVF-style ANN — deterministic k-means centroids
  from a driver-side sample, centroid assignment as a map_batches stage,
  search probes only the nprobe nearest centroid partitions. The scale
  path: assignment partitions the corpus once; queries touch a fraction.
- PqCodebook: product quantization — per-subspace k-means codebooks,
  m-uint8-codes-per-vector corpus table, ADC (lookup-table) search; the
  memory path when raw vectors don't fit cluster RAM.
- embedding_near_dup: cosine near-duplicate pairs via sign-LSH (random
  hyperplane) blocking + exact cosine verify.
- semdedup: SemDeDup-style semantic dedup (Abbas et al. 2023, public) —
  k-means clustering + within-cluster pairwise cosine; higher-id docs
  dominated by a lower-id cluster-mate above the threshold are dropped.

Reference analog: vector similarity search with min-score and top-k
(``blarify/repositories/graph_db_manager/queries.py:2298-2356``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _mat(col) -> np.ndarray:
    """list<float> column → (n, d) float64 matrix, zero-ish-copy via the
    flattened child values when the layout allows (no nulls, uniform
    length); falls back to a Python materialization otherwise."""
    arr = col.combine_chunks() if hasattr(col, "combine_chunks") else col
    try:
        if arr.null_count == 0:
            vals = np.asarray(arr.values, dtype=np.float64)
            return vals.reshape(len(arr), -1)
    except Exception:
        pass
    return np.array(arr.to_pylist(), dtype=np.float64)


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
        nq = qm.shape[0]
        kk = min(k, len(ids))
        top = np.argpartition(-sims, kk - 1, axis=0)[:kk]  # (kk, nq)
        qis = np.repeat(np.arange(nq, dtype=np.int32), kk)
        rows = top.T.reshape(-1)
        return pa.Table.from_pydict(
            {
                "qi": pa.array(qis),
                "id": pa.array(ids[rows]),
                "s": pa.array(sims[rows, np.repeat(np.arange(nq), kk)]),
            },
            schema=pa.schema(
                [("qi", pa.int32()), ("id", pa.int64()), ("s", pa.float64())]
            ),
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

    def _probe_ids(self, query_vec: np.ndarray, nprobe: int) -> list[int]:
        q = _unit(np.asarray(query_vec, dtype=np.float64))
        return sorted(int(i) for i in np.argsort(-(self.centroids @ q))[:nprobe])

    def search(
        self, assigned: ray.data.Dataset, query_vec: np.ndarray, k: int,
        nprobe: int = 4, id_col: str = "vec_id", emb_col: str = "embedding",
    ) -> list[tuple[int, float]]:
        """Probe over an in-memory assigned dataset: a map-only
        ``pc.is_in`` filter. Correct, but every query still SCANS every
        block — use ``write_partitioned`` + ``search_partitioned`` for
        the persisted-index scale path where queries read only the
        ``nprobe`` partition directories."""
        q = _unit(np.asarray(query_vec, dtype=np.float64))
        import pyarrow.compute as pc

        probe_arr = pa.array(self._probe_ids(query_vec, nprobe), pa.int32())

        def flt(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t["centroid"], value_set=probe_arr))

        filtered = assigned.map_batches(flt, batch_format="pyarrow")
        return knn_bruteforce(filtered, q[None, :], k, id_col=id_col, emb_col=emb_col)[0]

    def write_partitioned(
        self, ds: ray.data.Dataset, out_dir: str, emb_col: str = "embedding"
    ) -> str:
        """Persist the corpus hive-partitioned by assigned centroid — the
        IVF inverted-list layout. ZERO-SHUFFLE (the ``edges_by_dst``
        pattern, pipelines/kg_build.py): one streaming assign pass, and
        the hive write splits each batch across its centroid dirs; a dir
        may hold several files, which point reads tolerate. Searches then
        touch only the probed fraction of the corpus instead of
        filter-scanning every block."""
        self.assign(ds, emb_col=emb_col).write_parquet(
            out_dir, partition_cols=["centroid"]
        )
        return out_dir

    def probe_dirs(self, layout_dir: str, query_vec: np.ndarray, nprobe: int) -> list[str]:
        """The ≤ nprobe partition directories a query reads (existing
        dirs only — a centroid that captured no vectors has no dir)."""
        import os

        dirs = [
            os.path.join(layout_dir, f"centroid={p}")
            for p in self._probe_ids(query_vec, nprobe)
        ]
        return [d for d in dirs if os.path.isdir(d)]

    def search_partitioned(
        self, layout_dir: str, query_vec: np.ndarray, k: int,
        nprobe: int = 4, id_col: str = "vec_id", emb_col: str = "embedding",
    ) -> list[tuple[int, float]]:
        """IVF search against a ``write_partitioned`` layout: reads ONLY
        the ``nprobe`` probed partition dirs (column-pruned), then exact
        cosine top-k within them."""
        dirs = self.probe_dirs(layout_dir, query_vec, nprobe)
        if not dirs:
            return []
        # Ray 2.49 read_parquet treats a LIST of paths as files — expand
        # each probed dir to its parquet files (a dir may hold several)
        import glob
        import os

        files = sorted(
            f for d in dirs for f in glob.glob(os.path.join(d, "*.parquet"))
        )
        if not files:
            return []
        q = _unit(np.asarray(query_vec, dtype=np.float64))
        probed = ray.data.read_parquet(files, columns=[id_col, emb_col])
        return knn_bruteforce(probed, q[None, :], k, id_col=id_col, emb_col=emb_col)[0]


# --- Product quantization (PQ / ADC search) ----------------------------------


class PqCodebook:
    """Product quantization (Jégou et al., TPAMI 2011 — public): unit-
    normalized vectors split into ``m`` contiguous subspaces, one
    ``n_codes``-entry k-means codebook per subspace trained on a
    driver-side seeded sample; the corpus encodes to ``m`` uint8 codes
    per vector in one map-only pass. Search scores by asymmetric
    distance computation (ADC): a per-query (m × n_codes) lookup table
    of subspace inner products is built once, and a batch scores as
    Σ_m LUT[m, code[:, m]] — a pure gather + sum over the code table,
    no float matmul against raw vectors.

    100-TB shape: the code table is the ONLY corpus-scale search
    artifact — ``m`` bytes/vector (64-d float32 = 256 B → 8 B at m=8,
    32×), raw embeddings are read once at encode time and never again;
    the codebook (m × n_codes × dsub floats) broadcasts via ``ray.put``;
    search streams the code table with per-batch partial top-k (the
    ``knn_bruteforce`` exchange shape — only k rows leave a batch).
    Compose with ``IvfIndex`` for IVF-PQ: hive-partition the codes by
    centroid and ADC-score only the probed fraction.

    Reference analog: the min-score vector search of
    ``blarify/repositories/graph_db_manager/queries.py:2298-2356``,
    re-expressed for corpora whose raw vectors don't fit in cluster RAM.
    """

    def __init__(self, codebooks: np.ndarray):
        self.codebooks = np.asarray(codebooks, dtype=np.float64)  # (m, ks, dsub)
        self.m, self.ks, self.dsub = self.codebooks.shape

    @classmethod
    def train(
        cls, ds: ray.data.Dataset, m: int = 8, n_codes: int = 256,
        emb_col: str = "embedding", sample_n: int = 4096, iters: int = 10, seed: int = 7,
    ) -> "PqCodebook":
        sample = ds.random_sample(1.0, seed=seed).limit(sample_n).take_all()
        vecs = _unit(np.array([r[emb_col] for r in sample], dtype=np.float64))
        d = vecs.shape[1]
        if d % m:
            raise ValueError(f"dim {d} not divisible by m={m}")
        dsub = d // m
        ks = min(n_codes, len(vecs))
        rng = np.random.RandomState(seed)
        books = np.empty((m, ks, dsub), np.float64)
        for s in range(m):
            sub = vecs[:, s * dsub : (s + 1) * dsub]
            cent = sub[rng.choice(len(sub), size=ks, replace=False)]
            for _ in range(iters):
                # euclidean assignment: argmin |x-c|² = argmax x·c - |c|²/2
                a = np.argmax(sub @ cent.T - 0.5 * (cent * cent).sum(1), axis=1)
                for c in range(ks):
                    members = sub[a == c]
                    if len(members):
                        cent[c] = members.mean(axis=0)
            books[s] = cent
        return cls(books)

    def encode(
        self, ds: ray.data.Dataset, id_col: str = "vec_id", emb_col: str = "embedding",
    ) -> ray.data.Dataset:
        """(id, code: fixed-width list<uint8>) — the m-byte corpus table."""
        cb_ref = ray.put(self.codebooks)
        m, ks, dsub = self.m, self.ks, self.dsub

        def enc(t: pa.Table) -> pa.Table:
            cb = ray.get(cb_ref)
            vecs = _unit(_mat(t[emb_col]))
            codes = np.empty((len(vecs), m), np.uint8)
            for s in range(m):
                sub = vecs[:, s * dsub : (s + 1) * dsub]
                codes[:, s] = np.argmax(
                    sub @ cb[s].T - 0.5 * (cb[s] * cb[s]).sum(1), axis=1
                ).astype(np.uint8)
            return pa.Table.from_pydict(
                {
                    "id": t[id_col].cast(pa.int64()),
                    "code": pa.FixedSizeListArray.from_arrays(
                        pa.array(codes.reshape(-1), pa.uint8()), m
                    ),
                }
            )

        return ds.map_batches(enc, batch_format="pyarrow")

    def search(
        self, codes_ds: ray.data.Dataset, query_vec: np.ndarray, k: int,
    ) -> list[tuple[int, float]]:
        """ADC top-k over an encoded corpus: approx cosine = Σ_m
        q_sub[m] · codebook[m, code_m]. Gather + sum per batch, partial
        top-k rows out, k-scale driver merge."""
        q = _unit(np.asarray(query_vec, dtype=np.float64))
        lut = np.einsum("mkd,md->mk", self.codebooks, q.reshape(self.m, self.dsub))
        lut_ref = ray.put(lut)
        m = self.m

        def partial(t: pa.Table) -> pa.Table:
            lt = ray.get(lut_ref)
            arr = t["code"].combine_chunks()
            codes = np.asarray(arr.values, dtype=np.int64).reshape(len(arr), m)
            scores = lt[np.arange(m)[None, :], codes].sum(axis=1)
            ids = np.asarray(t["id"].to_pylist(), dtype=np.int64)
            kk = min(k, len(ids))
            top = np.argpartition(-scores, kk - 1)[:kk]
            return pa.Table.from_pydict(
                {"id": pa.array(ids[top], pa.int64()),
                 "s": pa.array(scores[top], pa.float64())}
            )

        rows = codes_ds.map_batches(partial, batch_format="pyarrow").take_all()
        return sorted(((r["id"], r["s"]) for r in rows), key=lambda t: (-t[1], t[0]))[:k]


def write_ivfpq(
    ivf: IvfIndex, pq: PqCodebook, ds: ray.data.Dataset, out_dir: str,
    id_col: str = "vec_id", emb_col: str = "embedding", keep_raw: bool = True,
) -> str:
    """IVF-PQ layout (the billion-scale ANN shape): ONE fused corpus
    pass assigns each vector to its centroid AND encodes it to m uint8
    codes, then hive-partitions the table by centroid — zero-shuffle
    (the ``edges_by_dst`` split). With ``keep_raw`` the raw vector
    travels along INTO the same layout so re-ranked search can point-
    read it column-pruned (the FAISS-refine / DiskANN discipline: ADC
    is a shortlist generator — quantization error cannot resolve
    near-tie neighbors, so exact re-scoring of the shortlist is what
    buys recall); without it the index is ~(m + 8) bytes/vector and
    search is pure ADC."""
    cent_ref = ray.put(ivf.centroids)
    cb_ref = ray.put(pq.codebooks)
    m, dsub = pq.m, pq.dsub

    def assign_encode(t: pa.Table) -> pa.Table:
        cent, cb = ray.get(cent_ref), ray.get(cb_ref)
        vecs = _unit(_mat(t[emb_col]))
        codes = np.empty((len(vecs), m), np.uint8)
        for s in range(m):
            sub = vecs[:, s * dsub : (s + 1) * dsub]
            codes[:, s] = np.argmax(
                sub @ cb[s].T - 0.5 * (cb[s] * cb[s]).sum(1), axis=1
            ).astype(np.uint8)
        cols = {
            "id": t[id_col].cast(pa.int64()),
            "code": pa.FixedSizeListArray.from_arrays(
                pa.array(codes.reshape(-1), pa.uint8()), m
            ),
            "centroid": pa.array(np.argmax(vecs @ cent.T, axis=1).astype(np.int32)),
        }
        if keep_raw:
            cols["embedding"] = t[emb_col]
        return pa.Table.from_pydict(cols)

    ds.map_batches(assign_encode, batch_format="pyarrow").write_parquet(
        out_dir, partition_cols=["centroid"]
    )
    return out_dir


def search_ivfpq(
    ivf: IvfIndex, pq: PqCodebook, layout_dir: str, query_vec: np.ndarray,
    k: int, nprobe: int = 4, rerank: int = 0,
) -> list[tuple[int, float]]:
    """Search a ``write_ivfpq`` layout: reads ONLY the ``nprobe``
    probed centroid dirs' code column (parquet column pruning keeps any
    stored raw vectors off the wire), scores by ADC lookup-table
    gather + sum. With ``rerank=r > 0`` the ADC top-r shortlist is
    re-scored with exact cosine against raw vectors point-read from the
    SAME probed dirs (requires ``keep_raw``) — a query then touches
    nprobe/n_centroids of the code table plus r raw vectors."""
    import glob
    import os

    dirs = ivf.probe_dirs(layout_dir, query_vec, nprobe)
    files = sorted(f for d in dirs for f in glob.glob(os.path.join(d, "*.parquet")))
    if not files:
        return []
    codes = ray.data.read_parquet(files, columns=["id", "code"])
    if not rerank:
        return pq.search(codes, query_vec, k)
    shortlist = pq.search(codes, query_vec, max(k, rerank))
    import pyarrow.compute as pc

    ids = pa.array(sorted(i for i, _ in shortlist), pa.int64())
    raw = ray.data.read_parquet(files, columns=["id", "embedding"]).map_batches(
        lambda t: t.filter(pc.is_in(t["id"], value_set=ids)), batch_format="pyarrow"
    )
    q = _unit(np.asarray(query_vec, dtype=np.float64))
    return knn_bruteforce(raw, q[None, :], k, id_col="id", emb_col="embedding")[0]


def embedding_near_dup(
    ds: ray.data.Dataset, threshold: float = 0.9, n_planes: int = 16, n_bands: int = 4,
    id_col: str = "vec_id", emb_col: str = "embedding", dim: int | None = None, seed: int = 11,
    max_bucket: int = 200, partitions: int = 64, cfg=None,
) -> ray.data.Dataset:
    """Cosine-similar pairs (a < b, cos ≥ threshold) via sign-LSH
    blocking: n_planes random hyperplanes → sign bits → bands.

    Scale shape (the ``ops/dedup.minhash_near_dup`` pattern): the banding
    shuffle moves (pkey, band, id) ONLY — the vector is never replicated
    per band row. Buckets above ``max_bucket`` are skipped (hot-bucket
    cap). Candidate pairs then fetch their two vectors via the
    size-tiered ``items_for_candidates`` prune (broadcast id array under
    ``cfg.dedup_candidate_broadcast_max`` pairs, co-partitioned semi-join
    above — the pair table never materializes on the driver) + a
    co-partitioned lookup join, and get exact cosine verification."""
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
        n = len(m)
        # vectorized bit packing: first bit of each band is the MSB,
        # matching the (val << 1) | bit loop order
        w = (1 << np.arange(bits_per_band - 1, -1, -1)).astype(np.int64)
        vals = signs.reshape(n, n_bands, bits_per_band).astype(np.int64) @ w
        band_ids = np.tile(np.arange(n_bands, dtype=np.int64), n)
        vals_flat = vals.reshape(-1)
        ids = np.repeat(np.asarray(t[id_col].to_pylist(), dtype=np.int64), n_bands)
        return pa.Table.from_pydict(
            {
                "pkey": pa.array(
                    ((vals_flat * n_bands + band_ids) % partitions).astype(np.int32)
                ),
                "band_id": pa.array(band_ids.astype(np.int32)),
                "band_val": pa.array(vals_flat.astype(np.int32)),
                "id": pa.array(ids),
            }
        )

    def bucket_pairs(g: pa.Table) -> pa.Table:
        buckets: dict[tuple[int, int], list[int]] = {}
        for b, v, i in zip(
            g["band_id"].to_pylist(), g["band_val"].to_pylist(), g["id"].to_pylist()
        ):
            buckets.setdefault((b, v), []).append(i)
        seen: set[tuple[int, int]] = set()
        out = {"a": [], "b": []}
        for members0 in buckets.values():
            if not (2 <= len(members0) <= max_bucket):
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

    cand = (
        ds.map_batches(band_rows, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(bucket_pairs, batch_format="pyarrow")
        .groupby(["a", "b"])
        .count()
        .select_columns(["a", "b"])
        .materialize()
    )
    if cand.count() == 0:
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                 "cos": pa.array([], pa.float64())}
            )
        )
    from ..config import DEFAULT_CONFIG
    from ..ops.dedup import attach_pair_payload, items_for_candidates

    vecs = items_for_candidates(
        ds, cand, id_col, [id_col, emb_col], cfg or DEFAULT_CONFIG, partitions=partitions
    )

    # pack the vector into a binary payload for the co-partitioned attach:
    # list/tensor-typed columns don't null-widen cleanly through a tagged
    # union, bytes do
    import pyarrow.compute as pc

    def pack(t: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                id_col: pc.cast(t[id_col], pa.int64()),
                "_vecb": pa.array(
                    [np.asarray(v, np.float64).tobytes() for v in t[emb_col].to_pylist()],
                    pa.binary(),
                ),
            }
        )

    packed = vecs.map_batches(pack, batch_format="pyarrow")
    enriched = attach_pair_payload(cand, packed, id_col, "_vecb", partitions=partitions)

    def verify(t: pa.Table) -> pa.Table:
        out = {"a": [], "b": [], "cos": []}
        for a, b, ba, bb in zip(
            t["a"].to_pylist(), t["b"].to_pylist(),
            t["_pa"].to_pylist(), t["_pb"].to_pylist(),
        ):
            va = _unit(np.frombuffer(ba, dtype=np.float64))
            vb = _unit(np.frombuffer(bb, dtype=np.float64))
            c = float(va @ vb)
            if c >= threshold:
                out["a"].append(int(a))
                out["b"].append(int(b))
                out["cos"].append(round(c, 6))
        return pa.Table.from_pydict(
            out, schema=pa.schema([("a", pa.int64()), ("b", pa.int64()), ("cos", pa.float64())])
        )

    return enriched.map_batches(verify, batch_format="pyarrow")


# --- SemDeDup (semantic dedup via embedding clustering) -----------------------


def _semdedup_empty() -> pa.Table:
    return pa.Table.from_pydict(
        {
            "vec_id": pa.array([], pa.int64()),
            "dup_of": pa.array([], pa.int64()),
            "cos": pa.array([], pa.float64()),
        }
    )


def semdedup(
    ds: ray.data.Dataset,
    threshold: float = 0.96,
    n_clusters: int = 16,
    partitions: int = 16,
    max_cluster: int = 4096,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """Semantic dedup over an embedding column (SemDeDup shape, Abbas et
    al. 2023 — public): k-means clusters the corpus, each cluster gets a
    local pairwise-cosine pass, and a row is DROPPED when some lower-id
    member of its cluster is within ``threshold`` cosine — the same
    dominated-by-lower-id drop rule as the engine's other near-dup ops.
    Returns the dropped rows as ``(vec_id, dup_of, cos)`` where
    ``dup_of`` is the smallest dominating lower id; kept set = corpus −
    result.

    Scale shape: clustering is the IVF trainer (driver-side seeded
    sample, cluster count is a parameter — size it ∝ corpus/target
    cluster size, the SemDeDup recipe); assignment is map-only; ONE
    cell-keyed exchange co-locates whole clusters (vectors travel once,
    as float32 blobs); the per-cluster O(m²/2) cosine check is a single
    triangular matmul. Clusters above ``max_cluster`` are processed in
    contiguous id-sorted blocks (pairs across blocks are not compared —
    the hot-cluster cap, same trade as ``max_lsh_bucket``)."""
    import pandas as pd

    if ds.limit(1).count() == 0:
        return ray.data.from_arrow(_semdedup_empty())
    idx = IvfIndex.train(ds, n_clusters, emb_col=emb_col)
    assigned = idx.assign(ds.select_columns([id_col, emb_col]), emb_col=emb_col)

    def pack(t: pa.Table) -> pa.Table:
        m = _unit(_mat(t[emb_col]))
        cells = np.asarray(t["centroid"].to_pylist(), dtype=np.int64)
        out = pd.DataFrame(
            {
                "cell": cells,
                "id": np.asarray(t[id_col].to_pylist(), dtype=np.int64),
                "v": [r.astype(np.float32).tobytes() for r in m],
            }
        )
        out["_pkey"] = (out["cell"] % partitions).astype("int32")
        return pa.Table.from_pandas(out, preserve_index=False)

    def cell_dups(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for _cell, sub in g.groupby("cell", sort=False):
            sub = sub.sort_values("id", kind="mergesort")
            ids = sub["id"].to_numpy(np.int64)
            for s0 in range(0, len(sub), max_cluster):
                blk = sub.iloc[s0 : s0 + max_cluster]
                if len(blk) < 2:
                    continue
                m = (
                    np.frombuffer(b"".join(blk["v"]), dtype=np.float32)
                    .reshape(len(blk), -1)
                    .astype(np.float64)
                )
                bids = ids[s0 : s0 + max_cluster]
                sims = m @ m.T
                # strictly-lower-triangle: candidate dominators are
                # LOWER-id rows only (ids are sorted within the block)
                hit = np.tril(sims >= threshold, k=-1)
                dropped = hit.any(axis=1)
                if not dropped.any():
                    continue
                first = np.argmax(hit[dropped], axis=1)  # smallest lower id
                di = np.flatnonzero(dropped)
                outs.append(
                    pd.DataFrame(
                        {
                            "vec_id": bids[di],
                            "dup_of": bids[first],
                            "cos": np.round(sims[di, first], 6),
                        }
                    )
                )
        if not outs:
            return pd.DataFrame(
                {
                    "vec_id": pd.Series([], dtype="int64"),
                    "dup_of": pd.Series([], dtype="int64"),
                    "cos": pd.Series([], dtype="float64"),
                }
            )
        return pd.concat(outs, ignore_index=True)

    from ..util import compact_nonempty

    return compact_nonempty(
        assigned.map_batches(pack, batch_format="pyarrow")
        .groupby("_pkey")
        .map_groups(cell_dups, batch_format="pandas")
    )


# --- k-NN graph construction -------------------------------------------------


def _knn_empty() -> pa.Table:
    return pa.Table.from_pydict(
        {
            "vec_id": pa.array([], pa.int64()),
            "nn_id": pa.array([], pa.int64()),
            "rank": pa.array([], pa.int32()),
            "sim": pa.array([], pa.float64()),
        }
    )


def _topk_rows(qids, nids, sims, k):
    """Per-query top-k by (sim desc, nn_id asc) over flat candidate rows
    → (vec_id, nn_id, rank, sim) arrays. Vectorized: one lexsort + one
    per-query rank via cumcount."""
    if len(qids) == 0:
        return (np.empty(0, np.int64),) * 2 + (np.empty(0, np.int32), np.empty(0, np.float64))
    order = np.lexsort((nids, -sims, qids))
    q, n_, s = qids[order], nids[order], sims[order]
    new_q = np.r_[True, q[1:] != q[:-1]]
    idx = np.arange(len(q))
    start = np.maximum.accumulate(np.where(new_q, idx, 0))
    rank = (idx - start).astype(np.int32)
    keep = rank < k
    return q[keep], n_[keep], rank[keep], s[keep]


def knn_join_exact(
    ds: ray.data.Dataset, k: int = 5, id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """Exact cosine k-NN graph: for EVERY row its k nearest neighbors
    (self excluded, ties → smaller neighbor id) →
    ``Dataset[(vec_id, nn_id, rank, sim)]``.

    The corpus (unit matrix + ids) broadcasts once via ``ray.put`` and
    each batch runs ONE matmul against it — the O(n²/batch) exact
    baseline and the verifier for the IVF-bucketed scale path
    (``knn_graph_ivf``). Use only while the corpus matrix fits a worker
    (the brute-force contract knn_bruteforce already sets)."""
    rows = ds.select_columns([id_col, emb_col]).take_all()
    if not rows:
        return ray.data.from_arrow(_knn_empty())
    ids = np.array([r[id_col] for r in rows], dtype=np.int64)
    mat = _unit(np.array([r[emb_col] for r in rows], dtype=np.float64))
    corpus_ref = ray.put((ids, mat))

    def partial(t: pa.Table) -> pa.Table:
        cids, cmat = ray.get(corpus_ref)
        m = _unit(_mat(t[emb_col]))
        qids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        sims = m @ cmat.T  # (batch, n)
        kk = min(k + 1, sims.shape[1])  # +1: self will be dropped
        # threshold-INCLUSIVE cut: keep every candidate tied with the
        # kk-th largest similarity, so the (sim desc, id asc) tie-break
        # in _topk_rows is applied to the full tie group — an
        # argpartition cut would pick an arbitrary subset of the ties
        thr = np.partition(sims, sims.shape[1] - kk, axis=1)[:, sims.shape[1] - kk]
        qi, ci = np.nonzero(sims >= thr[:, None])
        qq = qids[qi]
        nn = cids[ci]
        ss = sims[qi, ci]
        mask = qq != nn
        q2, n2, r2, s2 = _topk_rows(qq[mask], nn[mask], ss[mask], k)
        return pa.Table.from_pydict(
            {
                "vec_id": pa.array(q2),
                "nn_id": pa.array(n2),
                "rank": pa.array(r2),
                "sim": pa.array(s2),
            },
            schema=_knn_empty().schema,
        )

    return ds.map_batches(partial, batch_format="pyarrow")


def knn_graph_ivf(
    ds: ray.data.Dataset,
    k: int = 5,
    n_centroids: int = 16,
    nprobe: int = 4,
    partitions: int = 16,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
) -> ray.data.Dataset:
    """Approximate k-NN graph via IVF bucketing — the 100-TB shape: no
    broadcast of the corpus, no all-pairs.

    Every row enters its own centroid cell ONCE as an index row and its
    ``nprobe`` nearest cells as query rows; one cell-keyed exchange
    co-locates them, each cell runs a local matmul top-k, and a second
    (query-keyed, k-scale) exchange merges per-query candidates. The
    shuffle carries each vector 1+nprobe times — the standard IVF
    replication trade — and cells are processed as whole groups, so
    the per-cell matmul is vectorized. Recall vs ``knn_join_exact``
    rises with nprobe (tested ≥ 0.8 on clustered data)."""
    import pandas as pd

    idx = IvfIndex.train(ds, n_centroids, emb_col=emb_col)
    cent_ref = ray.put(idx.centroids)

    def emit(t: pa.Table) -> pa.Table:
        cent = ray.get(cent_ref)
        m = _unit(_mat(t[emb_col]))
        ids = np.asarray(t[id_col].to_pylist(), dtype=np.int64)
        sims = m @ cent.T
        npb = min(nprobe, cent.shape[0])
        probes = np.argpartition(-sims, npb - 1, axis=1)[:, :npb].astype(np.int32)
        own = np.argmax(sims, axis=1).astype(np.int32)
        blobs = [r.astype(np.float32).tobytes() for r in m]
        # index rows (is_q=0) in the row's own cell; query rows (is_q=1)
        # in each probed cell
        cells = np.concatenate([own, probes.reshape(-1)])
        rid = np.concatenate([ids, np.repeat(ids, npb)])
        isq = np.concatenate(
            [np.zeros(len(ids), np.int8), np.ones(len(ids) * npb, np.int8)]
        )
        vb = blobs + list(np.repeat(np.array(blobs, dtype=object), npb))
        out = pd.DataFrame({"cell": cells, "id": rid, "is_q": isq, "v": vb})
        out["_pkey"] = (out["cell"].to_numpy(np.int64) % partitions).astype("int32")
        return pa.Table.from_pandas(out, preserve_index=False)

    def cell_topk(g: pd.DataFrame) -> pd.DataFrame:
        outs = []
        for cell, sub in g.groupby("cell", sort=False):
            iq = sub[sub["is_q"] == 1]
            ix = sub[sub["is_q"] == 0]
            if iq.empty or ix.empty:
                continue
            qm = np.frombuffer(b"".join(iq["v"]), dtype=np.float32).reshape(len(iq), -1).astype(np.float64)
            xm = np.frombuffer(b"".join(ix["v"]), dtype=np.float32).reshape(len(ix), -1).astype(np.float64)
            sims = qm @ xm.T
            qids = iq["id"].to_numpy(np.int64)
            xids = ix["id"].to_numpy(np.int64)
            kk = min(k + 1, sims.shape[1])
            # threshold-inclusive cut (see knn_join_exact): boundary
            # ties all survive to the deterministic merge
            thr = np.partition(sims, sims.shape[1] - kk, axis=1)[:, sims.shape[1] - kk]
            qi, ci = np.nonzero(sims >= thr[:, None])
            qq = qids[qi]
            nn = xids[ci]
            ss = sims[qi, ci]
            m2 = qq != nn
            outs.append(pd.DataFrame({"vec_id": qq[m2], "nn_id": nn[m2], "sim": ss[m2]}))
        if not outs:
            return pd.DataFrame(
                {"vec_id": pd.Series([], dtype="int64"),
                 "nn_id": pd.Series([], dtype="int64"),
                 "sim": pd.Series([], dtype="float64")}
            )
        out = pd.concat(outs, ignore_index=True)
        out["_pkey"] = (out["vec_id"].to_numpy(np.int64) % partitions).astype("int32")
        return out

    def merge_q(g: pd.DataFrame) -> pd.DataFrame:
        # the same (query, neighbor) pair can surface from several probed
        # cells — dedup before ranking
        g = g.drop_duplicates(["vec_id", "nn_id"])
        q2, n2, r2, s2 = _topk_rows(
            g["vec_id"].to_numpy(np.int64),
            g["nn_id"].to_numpy(np.int64),
            g["sim"].to_numpy(np.float64),
            k,
        )
        return pd.DataFrame(
            {"vec_id": q2, "nn_id": n2, "rank": r2.astype(np.int32), "sim": s2}
        )

    from ..util import compact_nonempty

    cand = compact_nonempty(
        ds.map_batches(emit, batch_format="pyarrow")
        .groupby("_pkey")
        .map_groups(cell_topk, batch_format="pandas")
    )
    if cand.count() == 0:
        return ray.data.from_arrow(_knn_empty())
    return compact_nonempty(
        cand.groupby("_pkey").map_groups(merge_q, batch_format="pandas")
    )
