"""Distributed BPE tokenizer training + encoding (Sennrich et al. 2016,
public) — the tokenizer-construction step of a training-data pipeline.

Scale shape (the classic two-level decomposition):
- ``train_bpe``: the CORPUS-scale work is one distributed wordcount
  (per-batch ``value_counts`` partials → one word-keyed exchange); merge
  learning then runs on the VOCAB-scale (word, freq) table — weighted
  pair counts over distinct words, which is exactly how the original
  algorithm is defined, so the driver never sees the corpus. The vocab
  is capped to the top ``max_words`` by frequency for boundedness.
- ``bpe_encode``: the learned merge ranks are broadcast once
  (``ray.put``); each batch applies them per DISTINCT word (factorize →
  encode uniques → gather), so per-word Python runs at vocab-scale per
  batch, never per token.

Determinism: ties in pair frequency break lexicographically, so the
merge list is a pure function of the corpus.
"""

from __future__ import annotations

from collections import Counter

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

EOW = ""  # end-of-word sentinel symbol (never in corpus text)


def word_counts(
    ds: ray.data.Dataset, text_col: str, max_words: int = 100_000
) -> list[tuple[str, int]]:
    """Distributed wordcount → top ``max_words`` (word, freq), ordered by
    (freq desc, word) — the vocab-scale training table."""
    from ray.data.aggregate import Sum

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        vc = df[text_col].str.split(" ").explode().value_counts()
        vc = vc[vc.index != ""]
        return pd.DataFrame({"word": vc.index.astype(str), "n": vc.to_numpy(np.int64)})

    top = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("word")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "word"], descending=[True, False])
        .limit(max_words)
        .take_all()
    )
    return [(r["word"], r["n"]) for r in top]


def learn_merges(vocab: list[tuple[str, int]], n_merges: int) -> list[tuple[str, str]]:
    """Weighted BPE merge learning over a (word, freq) table. Pure
    in-process function of the vocab — deterministic (lexicographic
    tie-break), stops early when no pair repeats."""
    words: list[list[str]] = [list(w) + [EOW] for w, _ in vocab]
    freqs = [f for _, f in vocab]
    pair_counts: Counter = Counter()
    where: dict[tuple[str, str], set[int]] = {}
    for i, (syms, f) in enumerate(zip(words, freqs)):
        for a, b in zip(syms, syms[1:]):
            pair_counts[(a, b)] += f
            where.setdefault((a, b), set()).add(i)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        if not pair_counts:
            break
        best = min(pair_counts, key=lambda p: (-pair_counts[p], p))
        if pair_counts[best] < 2:
            break
        merges.append(best)
        a, b = best
        ab = a + b
        for i in sorted(where.get(best, ())):
            syms, f = words[i], freqs[i]
            # remove old pair contributions of this word, rebuild after merge
            for x, y in zip(syms, syms[1:]):
                pair_counts[(x, y)] -= f
                if pair_counts[(x, y)] <= 0:
                    del pair_counts[(x, y)]
                s = where.get((x, y))
                if s is not None:
                    s.discard(i)
                    if not s:
                        del where[(x, y)]
            out = []
            j = 0
            while j < len(syms):
                if j + 1 < len(syms) and syms[j] == a and syms[j + 1] == b:
                    out.append(ab)
                    j += 2
                else:
                    out.append(syms[j])
                    j += 1
            words[i] = out
            for x, y in zip(out, out[1:]):
                pair_counts[(x, y)] += f
                where.setdefault((x, y), set()).add(i)
    return merges


def train_bpe(
    ds: ray.data.Dataset,
    text_col: str,
    n_merges: int = 200,
    max_words: int = 100_000,
) -> list[tuple[str, str]]:
    """Distributed wordcount + driver merge learning (see module doc)."""
    return learn_merges(word_counts(ds, text_col, max_words), n_merges)


def encode_word(word: str, rank: dict[tuple[str, str], int]) -> list[str]:
    """Apply merges to one word by rank (lowest-rank pair first; position
    breaks rank ties) — the standard BPE inference loop."""
    syms = list(word) + [EOW]
    while len(syms) > 1:
        ranked = [
            (rank[p], i)
            for i, p in enumerate(zip(syms, syms[1:]))
            if p in rank
        ]
        if not ranked:
            break
        _, i = min(ranked)
        syms = syms[:i] + [syms[i] + syms[i + 1]] + syms[i + 2 :]
    return syms


def bpe_encode(
    ds: ray.data.Dataset,
    merges: list[tuple[str, str]],
    text_col: str,
    id_col: str,
) -> ray.data.Dataset:
    """→ ds[(id, n_words, n_tokens)]: BPE token counts per document. The
    merge table is broadcast once; each batch factorizes its words and
    encodes only the DISTINCT ones (vocab-scale Python per batch), then
    gathers counts back per word occurrence — never per-token Python over
    the corpus."""
    rank_ref = ray.put({p: i for i, p in enumerate(merges)})

    def f(df: pd.DataFrame) -> pd.DataFrame:
        from ..util import get_broadcast

        rank = get_broadcast(rank_ref)
        s = df[text_col].str.split(" ").explode()
        # drop null-text rows too: a NaN surviving into factorize gets
        # code -1, which would silently index the LAST unique word
        s = s[s.notna() & (s != "")]
        doc_idx = s.index.to_numpy()
        codes, uniq = pd.factorize(s.to_numpy(dtype=object))
        tok_per_uniq = np.fromiter(
            (len(encode_word(w, rank)) for w in uniq), np.int64, count=len(uniq)
        )
        n_tokens = np.zeros(len(df), np.int64)
        n_words = np.zeros(len(df), np.int64)
        if len(codes):
            np.add.at(n_tokens, doc_idx, tok_per_uniq[codes])
            np.add.at(n_words, doc_idx, 1)
        return pd.DataFrame(
            {
                "id": df[id_col].to_numpy(),
                "n_words": n_words,
                "n_tokens": n_tokens,
            }
        )

    def with_reset(df: pd.DataFrame) -> pd.DataFrame:
        return f(df.reset_index(drop=True))

    return ds.map_batches(with_reset, batch_format="pandas")
