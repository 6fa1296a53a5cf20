"""HyperBall — sketch-based distance analytics over a directed graph
(harmonic centrality, reachable-set size, distance distribution).

Public algorithm (Boldi & Vigna, "In-Core Computation of Geometric
Centralities with HyperBall", 2013): every node keeps a HyperLogLog
counter of the ball of nodes that can REACH it; one synchronous round
per radius merges each node's counter into its out-neighbors' counters
(register-wise max), so after round ``t`` node ``v``'s counter holds
``B⁻(v,t) = {u : d(u→v) ≤ t}``. The per-round estimate increments give

- ``harmonic(v) = Σ_t (|B⁻(v,t)| − |B⁻(v,t−1)|) / t`` — harmonic
  centrality (Σ_{u≠v} 1/d(u,v), the principled closeness variant that
  handles disconnected graphs), and
- ``reach(v) = |B⁻(v,∞)|`` — how many nodes can reach ``v``,

while the per-round totals ``N(t) = Σ_v |B⁻(v,t)|`` are the graph's
neighborhood function (→ effective diameter). Exact distance analytics
need one BFS per node (O(n·m) — impossible at web-KG scale); HyperBall
is one register-max pass per radius: O(rounds · m) work and
``2^b`` bytes of state per node, and register-wise max is
order-independent so the rounds are plain co-partitioned exchanges.

The reference ranks graph nodes driver-side with Cypher aggregates
(``blarify/repositories/graph_db_manager/queries.py:1692-1849``); this
is the sketch-powered scale analog, same family as ``ops/sketches.HLL``
(metrics, never semantics).

Size-tiered like every iterative op in this engine: below
``cfg.hyperball_driver_max_edges`` / ``_nodes`` the whole register
matrix lives on the driver and a round is one ``np.maximum.at``; above,
the (node, registers) state is a hash-partitioned dataset and a round is
a co-partitioned counter⋈edges attach + a node-keyed register-max
exchange. Both tiers run the identical register math on the identical
node hashes, so per-node outputs are BIT-IDENTICAL (forced-tier
tested); only the scalar ``N(t)`` totals differ by float summation
order.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..util import compact_nonempty


def _node_hashes(ids: np.ndarray) -> np.ndarray:
    """Deterministic 64-bit hash per node id (pandas' fixed-key siphash —
    stable across processes/runs, already the engine's routing hash)."""
    return pd.util.hash_array(ids.astype(object))


def _init_regs(ids: np.ndarray, b: int) -> np.ndarray:
    """(n, 2^b) uint8 register matrix holding each node's own id."""
    m = 1 << b
    h = _node_hashes(ids)
    idx = (h >> np.uint64(64 - b)).astype(np.int64)
    rest = (h << np.uint64(b)) | np.uint64(1 << (b - 1))
    lz = np.zeros(len(h), dtype=np.uint8)
    v = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = v < (np.uint64(1) << np.uint64(64 - shift))
        lz[mask] += shift
        v[mask] = v[mask] << np.uint64(shift)
    regs = np.zeros((len(h), m), dtype=np.uint8)
    regs[np.arange(len(h)), idx] = lz + 1
    return regs


def _est_rows(mat: np.ndarray) -> np.ndarray:
    """Row-wise HLL estimate (same formula as ``sketches.HLL.estimate``,
    small-range linear counting included) — identical math on identical
    registers in both tiers."""
    m = float(mat.shape[1])
    alpha = 0.7213 / (1 + 1.079 / m)
    s = np.sum(2.0 ** (-mat.astype(np.float64)), axis=1)
    e = alpha * m * m / s
    zeros = np.count_nonzero(mat == 0, axis=1)
    small = (e <= 2.5 * m) & (zeros > 0)
    with np.errstate(divide="ignore"):
        lc = m * np.log(m / np.maximum(zeros, 1))
    return np.where(small, lc, e)


def _blob_matrix(blobs: pd.Series, m: int) -> np.ndarray:
    """Stack a column of 2^b-byte register blobs into an (n, m) matrix."""
    if len(blobs) == 0:
        return np.zeros((0, m), dtype=np.uint8)
    return np.frombuffer(b"".join(blobs.to_numpy()), dtype=np.uint8).reshape(-1, m)


def _max_merge_by_key(keys: np.ndarray, mat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Group rows of ``mat`` by ``keys`` and register-max within groups →
    (unique_keys_sorted, merged_matrix). Vectorized: sort + reduceat."""
    order = np.argsort(keys, kind="stable")
    sk, sm = keys[order], mat[order]
    starts = np.flatnonzero(np.r_[True, sk[1:] != sk[:-1]])
    merged = np.maximum.reduceat(sm, starts, axis=0)
    return sk[starts], merged


def _hb_empty() -> pa.Table:
    return pa.Table.from_pydict(
        {
            "node": pa.array([], pa.string()),
            "reach": pa.array([], pa.float64()),
            "harmonic": pa.array([], pa.float64()),
        }
    )


def hyperball(
    pairs: ray.data.Dataset,
    nodes: ray.data.Dataset,
    b: int = 8,
    max_rounds: int = 32,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> tuple[ray.data.Dataset, pd.DataFrame]:
    """Run HyperBall over directed edges ``pairs[(x, y)]`` (x→y) and the
    node universe ``nodes[(node,)]`` → ``(Dataset[(node, reach,
    harmonic)], rounds)`` where ``rounds`` is a small DataFrame
    ``(t, total_reached)`` — the neighborhood function N(t), t=0 first.

    ``reach``/``harmonic`` include every node of ``nodes`` (isolated →
    reach ≈ 1, harmonic 0). Rounds stop early when no register changes
    (ball fixpoint = all shortest paths ≤ t covered) or at
    ``max_rounds``.
    """
    n_edges = pairs.count()
    n_nodes = nodes.count()
    if n_nodes == 0:
        return ray.data.from_arrow(_hb_empty()), pd.DataFrame(
            {"t": pd.Series([], dtype="int64"), "total_reached": pd.Series([], dtype="float64")}
        )
    if (
        n_edges <= cfg.hyperball_driver_max_edges
        and n_nodes <= cfg.hyperball_driver_max_nodes
    ):
        return _hyperball_driver(pairs, nodes, b, max_rounds)
    return _hyperball_distributed(pairs, nodes, n_edges, b, max_rounds, cfg)


def _hyperball_driver(
    pairs: ray.data.Dataset,
    nodes: ray.data.Dataset,
    b: int,
    max_rounds: int,
) -> tuple[ray.data.Dataset, pd.DataFrame]:
    """Driver tier: full (n, 2^b) register matrix, one unbuffered
    ``np.maximum.at`` per round. Correct while edges+registers fit on
    the driver — same bound class as the PageRank driver tier."""
    ids = np.array(sorted(r["node"] for r in nodes.take_all()), dtype=object)
    idx = {e: i for i, e in enumerate(ids)}
    er = pairs.take_all()
    src = np.fromiter((idx[r["x"]] for r in er), dtype=np.int64, count=len(er))
    dst = np.fromiter((idx[r["y"]] for r in er), dtype=np.int64, count=len(er))
    regs = _init_regs(ids, b)
    est = _est_rows(regs)
    harm = np.zeros(len(ids), dtype=np.float64)
    totals = [float(np.sum(est))]
    for t in range(1, max_rounds + 1):
        new = regs.copy()
        if len(src):
            np.maximum.at(new, dst, regs[src])
        if np.array_equal(new, regs):
            break
        regs = new
        new_est = _est_rows(regs)
        harm += (new_est - est) / float(t)
        est = new_est
        totals.append(float(np.sum(est)))
    out = ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "node": pa.array(list(ids), pa.string()),
                "reach": pa.array(est, pa.float64()),
                "harmonic": pa.array(harm, pa.float64()),
            }
        )
    )
    rounds = pd.DataFrame(
        {
            "t": pd.Series(range(len(totals)), dtype="int64"),
            "total_reached": pd.Series(totals, dtype="float64"),
        }
    )
    return out, rounds


def _hyperball_distributed(
    pairs: ray.data.Dataset,
    nodes: ray.data.Dataset,
    n_edges: int,
    b: int,
    max_rounds: int,
    cfg: PipelineConfig,
) -> tuple[ray.data.Dataset, pd.DataFrame]:
    """Distributed tier. State = hash-partitioned ``(node, reg-blob,
    est, harm)`` dataset (2^b bytes/node). Per round: (1) attach each
    edge's SOURCE counter by one co-partitioning shuffle, (2) per-batch
    register-max partials grouped by destination + one node-keyed
    register-max exchange (blobs move, never ids×radius), (3) left-attach
    the inbound counter back onto the state and fold: new registers,
    harmonic increment, changed flag. Early-stops via one column sum."""
    from ..ops.joins import copartition_attach

    m = 1 << b
    parts = max(1, min(cfg.agg_partitions, n_edges // cfg.cc_rows_per_partition + 1))

    def init_state(df: pd.DataFrame) -> pd.DataFrame:
        ids = df["node"].to_numpy(dtype=object)
        regs = _init_regs(ids, b)
        return pd.DataFrame(
            {
                "node": df["node"],
                "reg": [r.tobytes() for r in regs],
                "est": _est_rows(regs),
                "harm": np.zeros(len(df), dtype=np.float64),
            }
        )

    state = nodes.map_batches(init_state, batch_format="pandas").materialize()
    totals = [state.sum("est") or 0.0]

    for t in range(1, max_rounds + 1):
        src_regs = state.map_batches(
            lambda df: df[["node", "reg"]], batch_format="pandas"
        )
        hits = copartition_attach(
            pairs, src_regs, "x", "node", {"reg": "reg"},
            partitions=parts, how="inner",
        )

        def inbound_partial(df: pd.DataFrame) -> pd.DataFrame:
            keys, codes = np.unique(df["y"].to_numpy(dtype=object), return_inverse=True)
            mat = _blob_matrix(df["reg"], m)
            _, merged = _max_merge_by_key(codes, mat)
            out = pd.DataFrame(
                {"node": keys, "inreg": [r.tobytes() for r in merged]}
            )
            out["_pkey"] = (
                pd.util.hash_array(out["node"].to_numpy(dtype=object)) % parts
            ).astype("int32")
            return out

        def inbound_merge(g: pd.DataFrame) -> pd.DataFrame:
            keys, codes = np.unique(g["node"].to_numpy(dtype=object), return_inverse=True)
            mat = _blob_matrix(g["inreg"], m)
            _, merged = _max_merge_by_key(codes, mat)
            return pd.DataFrame({"node": keys, "inreg": [r.tobytes() for r in merged]})

        inbound = compact_nonempty(
            hits.map_batches(inbound_partial, batch_format="pandas")
            .groupby("_pkey")
            .map_groups(inbound_merge, batch_format="pandas")
        )

        def fold(df: pd.DataFrame, _t=t) -> pd.DataFrame:
            cur = _blob_matrix(df["reg"], m)
            have = df["inreg"].notna().to_numpy()
            new = cur.copy()
            if have.any():
                inb = _blob_matrix(df.loc[have, "inreg"], m)
                new[have] = np.maximum(cur[have], inb)
            changed = np.any(new != cur, axis=1)
            est = df["est"].to_numpy(dtype=np.float64)
            new_est = est.copy()
            if changed.any():
                new_est[changed] = _est_rows(new[changed])
            harm = df["harm"].to_numpy(dtype=np.float64) + (new_est - est) / float(_t)
            return pd.DataFrame(
                {
                    "node": df["node"],
                    "reg": [r.tobytes() for r in new],
                    "est": new_est,
                    "harm": harm,
                    "changed": changed.astype(np.int64),
                }
            )

        state = (
            copartition_attach(
                state, inbound, "node", "node", {"inreg": "inreg"},
                partitions=parts, how="left",
            )
            .map_batches(fold, batch_format="pandas")
            .materialize()
        )
        if not (state.sum("changed") or 0):
            break
        totals.append(state.sum("est") or 0.0)

    out = state.map_batches(
        lambda df: pd.DataFrame(
            {"node": df["node"], "reach": df["est"], "harmonic": df["harm"]}
        ),
        batch_format="pandas",
    )
    rounds = pd.DataFrame(
        {
            "t": pd.Series(range(len(totals)), dtype="int64"),
            "total_reached": pd.Series(totals, dtype="float64"),
        }
    )
    return out, rounds


def effective_diameter(rounds: pd.DataFrame, q: float = 0.9) -> int:
    """Smallest radius ``t`` with ``N(t) ≥ q·N(∞)`` from the
    neighborhood-function table (0 for an empty/degenerate graph)."""
    if rounds.empty:
        return 0
    target = q * float(rounds["total_reached"].iloc[-1])
    hit = rounds[rounds["total_reached"] >= target]
    return int(hit["t"].iloc[0]) if len(hit) else int(rounds["t"].iloc[-1])
