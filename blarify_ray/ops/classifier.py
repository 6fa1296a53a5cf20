"""Distributed quality-classifier training — the seed-labeled logistic
regression that CCNet / the GPT-3 appendix use to score web documents
against a high-quality reference (public methodology; fastText's
hashing-trick features, Weinberger et al. 2009).

The engine piece is the TRAINING LOOP SHAPE, the classic data-parallel
allreduce: per epoch, one ``map_batches`` pass computes each batch's
gradient partial (Xᵀ(σ(Xw) − y), plus loss/count), the driver sums the
partials and takes one full-batch GD step, and the updated weight
vector broadcasts back via ``ray.put``. Driver state is MODEL-scale
(``dim`` float64s), never corpus-scale; the corpus is read once per
epoch and nothing shuffles. Scoring is a map-only pass.

Features are hashing-trick bag-of-words: token → stable 64-bit hash %
``dim``, L2-normalized counts — no vocabulary table to build or ship.
Deterministic end to end (fixed init, full-batch updates, order-free
partial sums up to float association; the planted-truth test pins
behaviour, not bit patterns).

Reference analog: the reference scores nodes with an external LLM
behind a retry/fallback chain (``blarify/agents/llm_provider.py``);
this is the self-hosted scorer a 100-TB pipeline trains instead, at the
cost of one gradient exchange per epoch.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data

_TOKEN_MULT = np.uint64(0x9E3779B97F4A7C15)


def hash_features(texts: pd.Series, dim: int) -> tuple[np.ndarray, np.ndarray]:
    """Row-normalized hashed bag-of-words as a (indices, counts,
    offsets) triple — a scipy-free CSR. Vectorized per batch: one
    tokenize pass, one hash over the flattened token array."""
    toks = texts.fillna("").str.split()
    lens = toks.map(len).to_numpy(np.int64)
    flat = [t for ts in toks for t in ts]
    if flat:
        h = pd.util.hash_array(np.asarray(flat, dtype=object)) * _TOKEN_MULT
        idx = (h % np.uint64(dim)).astype(np.int64)
    else:
        idx = np.zeros(0, np.int64)
    offsets = np.zeros(len(texts) + 1, np.int64)
    np.cumsum(lens, out=offsets[1:])
    return idx, offsets


def _xw(idx: np.ndarray, offsets: np.ndarray, w: np.ndarray) -> np.ndarray:
    """(Xw) for the implicit CSR with unit counts, L2-normalized rows:
    row i → Σ w[idx[j]] / sqrt(nnz_i)."""
    n = len(offsets) - 1
    sums = np.add.reduceat(
        np.concatenate([w[idx], [0.0]]), np.minimum(offsets[:-1], len(idx))
    ) if len(idx) else np.zeros(n, np.float64)
    sums = np.where(offsets[1:] > offsets[:-1], sums, 0.0)
    norms = np.sqrt(np.maximum(offsets[1:] - offsets[:-1], 1)).astype(np.float64)
    return sums / norms


def _grad_partial(
    idx: np.ndarray, offsets: np.ndarray, y: np.ndarray, w: np.ndarray, dim: int
) -> tuple[np.ndarray, float, int]:
    z = _xw(idx, offsets, w)
    p = 1.0 / (1.0 + np.exp(-z))
    err = p - y  # dL/dz per row
    # scatter err/norm back onto the hashed dims
    norms = np.sqrt(np.maximum(offsets[1:] - offsets[:-1], 1)).astype(np.float64)
    per_tok = np.repeat(err / norms, np.diff(offsets))
    g = np.zeros(dim, np.float64)
    if len(idx):
        np.add.at(g, idx, per_tok)
    eps = 1e-12
    loss = float(-(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps)).sum())
    return g, loss, len(y)


def train_logreg(
    ds: ray.data.Dataset,
    text_col: str,
    label_col: str,
    dim: int = 1 << 18,
    epochs: int = 20,
    lr: float = 2.0,
    l2: float = 1e-6,
) -> tuple[np.ndarray, list[float]]:
    """Full-batch GD over hashed BoW features. Returns (weights,
    per-epoch mean losses). One gradient exchange per epoch: each batch
    ships a dim-float partial; the driver holds only the model."""
    w = np.zeros(dim, np.float64)
    losses: list[float] = []
    # driver-ingress guard: with many input blocks, fold batch partials
    # per bucket BEFORE the driver so an epoch ships n_fold dim-blobs up,
    # not one per block (a 100-TB corpus has millions of blocks); small
    # inputs skip the extra exchange — same sums either way
    n_fold = 64
    try:
        # pin the input once — every epoch re-reads these cached blocks
        # instead of re-executing the upstream plan
        ds = ds.materialize()
        use_fold = ds.num_blocks() > n_fold
    except Exception:
        use_fold = True
    for _ in range(epochs):
        w_ref = ray.put(w)

        def partial(df: pd.DataFrame) -> pd.DataFrame:
            from ..util import get_broadcast

            wt = get_broadcast(w_ref)
            idx, offsets = hash_features(df[text_col], dim)
            y = df[label_col].to_numpy(np.float64)
            g, loss, n = _grad_partial(idx, offsets, y, wt, dim)
            b = (
                int(pd.util.hash_pandas_object(df[text_col].head(1)).iloc[0])
                % n_fold
                if len(df)
                else 0
            )
            return pd.DataFrame(
                {"_pkey": [np.int32(b)],
                 "g": [g.astype(np.float32).tobytes()], "loss": [loss], "n": [n]}
            )

        def fold(g_: pd.DataFrame) -> pd.DataFrame:
            acc = np.zeros(dim, np.float64)
            for blob in g_["g"]:
                acc += np.frombuffer(blob, np.float32).astype(np.float64)
            return pd.DataFrame(
                {"g": [acc.astype(np.float64).tobytes()],
                 "loss": [float(g_["loss"].sum())], "n": [int(g_["n"].sum())]}
            )

        staged = ds.map_batches(partial, batch_format="pandas")
        if use_fold:
            staged = staged.groupby("_pkey").map_groups(fold, batch_format="pandas")
        parts = staged.take_all()
        if not parts:
            break
        g = np.zeros(dim, np.float64)
        loss, n = 0.0, 0
        for r in parts:
            blob = r["g"]  # folded rows are float64, raw partials float32
            g += (
                np.frombuffer(blob, np.float64)
                if len(blob) == dim * 8
                else np.frombuffer(blob, np.float32).astype(np.float64)
            )
            loss += r["loss"]
            n += r["n"]
        if n == 0:
            break
        w = w - lr * (g / n + l2 * w)
        losses.append(loss / n)
    return w, losses


def score_logreg(
    ds: ray.data.Dataset, w: np.ndarray, text_col: str, id_col: str,
    keep_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """Map-only scoring pass: (id, prob[, *keep_cols] copied through)."""
    dim = len(w)
    w_ref = ray.put(w)

    def f(df: pd.DataFrame) -> pd.DataFrame:
        from ..util import get_broadcast

        wt = get_broadcast(w_ref)
        idx, offsets = hash_features(df[text_col], dim)
        z = _xw(idx, offsets, wt)
        out = {
            "id": df[id_col].to_numpy(np.int64),
            "prob": 1.0 / (1.0 + np.exp(-z)),
        }
        for c in keep_cols or ():
            out[c] = df[c].to_numpy()
        return pd.DataFrame(out)

    return ds.map_batches(f, batch_format="pandas")
