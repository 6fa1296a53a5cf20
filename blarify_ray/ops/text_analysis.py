"""Text-analysis operators: language ID, quality scoring, token counts,
document fingerprinting. All vectorized-per-batch, stateless or
regex-compiled-once actor pools.

Reference analog: per-node complexity stats (``blarify/stats/complexity.py:23-82``)
and the skeletonize/normalize text transforms (``definition_node.py:100-138``).
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
import ray.data

# --- language ID (n-gram/stopword heuristic) -------------------------------

_STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is you that it he was for on are as with his they at be this have from or one had by word but not what all were we when your can said there use an each which she do how their if".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf für ist im dem nicht ein eine als auch es an werden aus er hat dass sie nach wird bei einer um am sind noch wie einem über".split()),
    "fr": frozenset("le de un être et à il avoir ne je son que se qui ce dans en du elle au pour pas sur par plus pouvoir avec tout faire mettre autre on mais nous comme ou si leur".split()),
    "es": frozenset("el la de que y a en un ser se no haber por con su para como estar tener le lo lo pero más hacer o poder decir este ir otro ese si me ya ver porque dar cuando".split()),
}
_WORD = re.compile(r"[a-zA-ZäöüßéèêàâçíóúñÁÉ]+")


def lang_id_text(text: str) -> tuple[str, float]:
    """→ (lang, confidence). CJK-dominant text → 'zh'; otherwise argmax
    stopword-hit ratio over built-in profiles; no hits → 'und'."""
    if not text:
        return "und", 0.0
    cjk = sum(1 for ch in text[:2000] if "一" <= ch <= "鿿")
    if cjk > len(text[:2000]) * 0.2:
        return "zh", round(cjk / len(text[:2000]), 4)
    toks = [w.lower() for w in _WORD.findall(text[:5000])]
    if not toks:
        return "und", 0.0
    best, best_r = "und", 0.0
    for lang in sorted(_STOPWORDS):
        r = sum(1 for t in toks if t in _STOPWORDS[lang]) / len(toks)
        if r > best_r:
            best, best_r = lang, r
    if best_r < 0.05:
        return "und", round(best_r, 4)
    return best, round(best_r, 4)


def lang_id(ds: ray.data.Dataset, text_col: str, id_col: str) -> ray.data.Dataset:
    def f(t: pa.Table) -> pa.Table:
        res = [lang_id_text(x) for x in t[text_col].to_pylist()]
        return pa.Table.from_pydict(
            {
                "id": t[id_col],
                "lang_pred": pa.array([r[0] for r in res], pa.string()),
                "lang_conf": pa.array([r[1] for r in res], pa.float64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


# --- quality scoring -------------------------------------------------------

_ALPHA = re.compile(r"[A-Za-z]")
_PUNCT = re.compile(r"[.,;:!?'\"()\[\]{}-]")


def quality_features(text: str) -> dict:
    n = len(text)
    if n == 0:
        return {"n_chars": 0, "alpha_ratio": 0.0, "punct_ratio": 0.0,
                "mean_word_len": 0.0, "stop_ratio": 0.0, "quality": 0.0}
    words = text.split()
    alpha = len(_ALPHA.findall(text))
    punct = len(_PUNCT.findall(text))
    stop = sum(1 for w in words if w.lower() in _STOPWORDS["en"])
    mean_wl = sum(len(w) for w in words) / max(1, len(words))
    alpha_r = alpha / n
    punct_r = punct / n
    stop_r = stop / max(1, len(words))
    # simple composite in [0, 1]: alphabetic, sane word length, some
    # stopwords (fluent prose), not punctuation soup
    quality = max(
        0.0,
        min(
            1.0,
            0.5 * alpha_r
            + 0.3 * min(stop_r / 0.4, 1.0)
            + 0.2 * (1.0 - min(abs(mean_wl - 5.0) / 5.0, 1.0))
            - max(0.0, punct_r - 0.1),
        ),
    )
    return {
        "n_chars": n,
        "alpha_ratio": round(alpha_r, 6),
        "punct_ratio": round(punct_r, 6),
        "mean_word_len": round(mean_wl, 6),
        "stop_ratio": round(stop_r, 6),
        "quality": round(quality, 6),
    }


def quality_score(ds: ray.data.Dataset, text_col: str, id_col: str) -> ray.data.Dataset:
    def f(t: pa.Table) -> pa.Table:
        feats = [quality_features(x) for x in t[text_col].to_pylist()]
        cols: dict = {"id": t[id_col]}
        for k in ("n_chars", "alpha_ratio", "punct_ratio", "mean_word_len", "stop_ratio", "quality"):
            typ = pa.int64() if k == "n_chars" else pa.float64()
            cols[k] = pa.array([f[k] for f in feats], typ)
        return pa.Table.from_pydict(cols)

    return ds.map_batches(f, batch_format="pyarrow")


# --- document fingerprinting (winnowing over rolling hashes) ---------------

def fingerprint_text(text: str, k: int = 5, window: int = 4) -> list[int]:
    """Winnowed rolling-hash fingerprints over word k-grams (the classic
    MOSS scheme): min hash per sliding window, deduplicated, sorted."""
    toks = text.split()
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)]
    hs = [
        int.from_bytes(hashlib.md5(g.encode("utf-8")).digest()[:8], "big") >> 1
        for g in grams
    ]
    if not hs:
        return []
    picked = set()
    for i in range(max(1, len(hs) - window + 1)):
        picked.add(min(hs[i : i + window]))
    return sorted(picked)


def fingerprints(ds: ray.data.Dataset, text_col: str, id_col: str) -> ray.data.Dataset:
    def f(t: pa.Table) -> pa.Table:
        fps = [fingerprint_text(x) for x in t[text_col].to_pylist()]
        return pa.Table.from_pydict(
            {
                "id": t[id_col],
                "fingerprints": pa.array(fps, pa.list_(pa.uint64())),
                "n_fingerprints": pa.array([len(f) for f in fps], pa.int64()),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


# --- n-gram LM perplexity scoring (CCNet-style quality filter) --------------

LM_SEP = 0  # document separator byte — windows crossing it are dropped


def _gram_codes(buf, n: int):
    """Vectorized byte-n-gram codes over a uint8 buffer: each window of n
    consecutive bytes packs into one integer; windows containing the
    document separator are masked out. Returns (codes:int64, valid:bool)
    aligned to window start positions."""
    import numpy as np

    v = buf.astype(np.int64)
    if len(v) < n:
        return np.empty(0, np.int64), np.empty(0, bool)
    code = v[: len(v) - n + 1].copy()
    valid = v[: len(v) - n + 1] != LM_SEP
    for i in range(1, n):
        w = v[i : len(v) - n + 1 + i]
        code = (code << 8) | w
        valid &= w != LM_SEP
    return code, valid


def _batch_buffer(texts: list[str]):
    """Concatenate a batch's texts into ONE uint8 buffer with separator
    bytes, plus per-doc window offsets — so gram extraction and scoring
    are single numpy passes over the whole batch, never per-row Python."""
    import numpy as np

    blobs = [t.encode("utf-8", errors="ignore") for t in texts]
    lens = np.fromiter((len(b) for b in blobs), np.int64, count=len(blobs))
    buf = np.frombuffer(b"\x00".join(blobs), dtype=np.uint8) if blobs else np.empty(0, np.uint8)
    starts = np.zeros(len(blobs), np.int64)
    if len(blobs) > 1:
        starts[1:] = np.cumsum(lens[:-1] + 1)
    return buf, starts, lens


class ByteTrigramLM:
    """Add-α-smoothed byte-trigram LM: P(c|ab) = (n_abc+α)/(n_ab+256α).
    Model = two sorted (code, count) arrays — trigrams (top-k capped) and
    bigram contexts — a few MB, broadcast once via ``ray.put``."""

    ALPHA = 0.1

    def __init__(self, tri_codes, tri_counts, bi_codes, bi_counts):
        self.tri_codes, self.tri_counts = tri_codes, tri_counts
        self.bi_codes, self.bi_counts = bi_codes, bi_counts

    def bits_per_byte(self, buf, starts, lens):
        """Mean -log2 P over each doc's trigram windows (vectorized:
        searchsorted lookups + reduceat over doc boundaries)."""
        import numpy as np

        tri, tvalid = _gram_codes(buf, 3)
        bi, _ = _gram_codes(buf, 2)

        def lookup(codes, table, counts):
            pos = np.searchsorted(table, codes)
            pos_c = np.clip(pos, 0, max(len(table) - 1, 0))
            hit = (table[pos_c] == codes) if len(table) else np.zeros(len(codes), bool)
            return np.where(hit, counts[pos_c] if len(table) else 0, 0).astype(np.float64)

        n3 = lookup(tri, self.tri_codes, self.tri_counts)
        n2 = lookup(bi[: len(tri)], self.bi_codes, self.bi_counts)
        p = (n3 + self.ALPHA) / (n2 + 256.0 * self.ALPHA)
        bits = np.where(tvalid, -np.log2(p), 0.0)
        # per-doc windows: doc i contributes windows [starts[i], starts[i]+max(len-2,0))
        n_win = np.maximum(lens - 2, 0)
        out_bits = np.zeros(len(starts))
        nz = (n_win > 0) & (starts < len(bits))
        if nz.any():
            seg = np.add.reduceat(bits, starts[nz])
            # reduceat sums to the NEXT start — windows between docs are
            # masked to 0 by tvalid (separator windows), so the segment
            # sum equals the doc's sum
            out_bits[nz] = seg / n_win[nz]
        return out_bits, n_win


def train_byte_trigram_lm(
    ds: ray.data.Dataset, text_col: str, top_k: int = 200_000
) -> ByteTrigramLM:
    """Distributed LM training: each batch emits (gram_code, n) count
    partials for trigrams and bigram contexts (ONE vectorized pass over
    the batch's concatenated byte buffer), one gram-keyed exchange sums
    them, and the vocab-scale result (top-k trigrams by count + all
    bigram contexts) is pulled to the driver — the corpus itself never
    leaves the workers. The CCNet quality-filter shape: train once,
    broadcast, score everything."""
    import numpy as np
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        buf, _, _ = _batch_buffer(t[text_col].to_pylist())
        out_g, out_n = [], []
        for n, tag in ((3, 1 << 40), (2, 2 << 40)):  # tag disambiguates gram length
            codes, valid = _gram_codes(buf, n)
            u, c = np.unique(codes[valid], return_counts=True)
            out_g.append(u + tag)
            out_n.append(c)
        return pa.Table.from_pydict(
            {
                "g": pa.array(np.concatenate(out_g), pa.int64()),
                "n": pa.array(np.concatenate(out_n), pa.int64()),
            }
        )

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("g")
        .aggregate(Sum("n", alias_name="n"))
    )
    import pyarrow.compute as pc

    counts = counts.materialize()  # vocab-scale; two consumers below
    tri = (
        counts.map_batches(
            lambda t: t.filter(pc.less(t["g"], 2 << 40)), batch_format="pyarrow"
        )
        .sort(["n", "g"], descending=[True, False])
        .limit(top_k)
        .take_all()
    )
    bi = counts.map_batches(
        lambda t: t.filter(pc.greater_equal(t["g"], 2 << 40)), batch_format="pyarrow"
    ).take_all()

    def arrays(rows, tag):
        g = np.array([r["g"] - tag for r in rows], np.int64)
        n = np.array([r["n"] for r in rows], np.int64)
        srt = np.argsort(g, kind="mergesort")
        return g[srt], n[srt]

    return ByteTrigramLM(*arrays(tri, 1 << 40), *arrays(bi, 2 << 40))


def lm_perplexity(
    ds: ray.data.Dataset, lm: ByteTrigramLM, text_col: str, id_col: str
) -> ray.data.Dataset:
    """Score every document's bits-per-byte under a trained LM — pure map
    pass, model broadcast once (``ray.put``), all-numpy scoring."""
    import ray

    ref = ray.put(lm)

    def f(t: pa.Table) -> pa.Table:
        from ..util import get_broadcast

        m = get_broadcast(ref)
        buf, starts, lens = _batch_buffer(t[text_col].to_pylist())
        bpb, n_win = m.bits_per_byte(buf, starts, lens)
        return pa.Table.from_pydict(
            {
                "id": t[id_col],
                "bits_per_byte": pa.array(np.round(bpb, 6), pa.float64()),
                "n_windows": pa.array(n_win, pa.int64()),
            }
        )

    import numpy as np

    return ds.map_batches(f, batch_format="pyarrow")


# --- benchmark decontamination (verbatim-overlap scan) ----------------------

def contamination(
    ds: ray.data.Dataset, text_col: str, id_col: str, snippets: list[str]
) -> ray.data.Dataset:
    """Benchmark-decontamination scan: for each document, count how many
    benchmark snippets appear VERBATIM in its text (the n-gram-overlap
    decontamination step of LLM training-data pipelines); docs with zero
    hits are dropped (inner-join semantics).

    Scale shape: the snippet MULTISET (duplicates count separately, like
    a SQL contains-join) is broadcast ONCE via ``ray.put`` — it is
    benchmark-scale by definition — and the corpus streams through one
    map pass; each snippet costs one vectorized ``match_substring``
    kernel per batch, so work is O(|corpus| · |benchmark|) with no
    shuffle and no driver materialization of the corpus."""
    import numpy as np
    import pyarrow.compute as pc
    import ray

    ref = ray.put(sorted(snippets))  # multiset, sorted for determinism

    def f(t: pa.Table) -> pa.Table:
        from ..util import get_broadcast

        sn = get_broadcast(ref)
        hits = np.zeros(t.num_rows, np.int64)
        col = t[text_col]
        for s in sn:
            m = pc.match_substring(col, pattern=s).combine_chunks()
            hits += np.asarray(m, dtype=bool).astype(np.int64)
        keep = hits > 0
        return pa.Table.from_pydict(
            {
                id_col: t[id_col].filter(pa.array(keep)) if isinstance(t[id_col], pa.ChunkedArray) else pa.array(np.asarray(t[id_col])[keep]),
                "n_hits": pa.array(hits[keep]),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")


def compression_ratio(
    ds: ray.data.Dataset, text_col: str, id_col: str, level: int = 6
) -> ray.data.Dataset:
    """Per-doc zlib compression ratio — the MassiveText/Gopher
    repetitiveness signal (highly compressible text ⇒ boilerplate or
    repetition; near-incompressible ⇒ noise/binary junk). Map-only, one
    corpus pass; stdlib zlib, no model. Ratio = compressed/raw bytes
    (1-byte docs still defined; empty text → ratio of the empty
    stream's overhead against a floor of 1 raw byte)."""
    import zlib

    def f(t: pa.Table) -> pa.Table:
        texts = t[text_col].to_pylist()
        raw = [len((x or "").encode("utf-8")) for x in texts]
        comp = [len(zlib.compress((x or "").encode("utf-8"), level)) for x in texts]
        return pa.Table.from_pydict(
            {
                "id": t[id_col].cast(pa.int64()),
                "raw_bytes": pa.array(raw, pa.int64()),
                "zlib_bytes": pa.array(comp, pa.int64()),
                "zlib_ratio": pa.array(
                    [c / max(r, 1) for c, r in zip(comp, raw)], pa.float64()
                ),
            }
        )

    return ds.map_batches(f, batch_format="pyarrow")
