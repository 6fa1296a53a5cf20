"""Canonicalization semantics (MinHash-LSH blocking + union-find), in a
serial, pure form. This module is the SPEC: the distributed stage
(``stages/canonicalize.py``) must produce exactly this mapping; tests
compare them.

Rules (deterministic):
- node set = unknown normalized surfaces ∪ unambiguous known alias norms;
- candidate pair = shares ≥1 LSH band AND has ≥1 unknown side (known
  entities are never merged with each other — the duplicate_names
  guarantee); within a bucket only unk×known and unk×unk pairs are even
  enumerated, so dense all-known buckets cost nothing;
- pair kept iff char-shingle Jaccard ≥ threshold;
- each unknown's best known attachment = argmax Jaccard over its kept
  (unk, known) pairs, ties → lexicographically smallest known norm;
- union-find over kept unk–unk pairs → unknown clusters;
- a cluster canonicalizes to the best attachment among its members
  (max Jaccard, tie → smallest known norm), else its smallest member
  surface becomes a new UNK entity.

The iterative-fixpoint shape of the distributed version mirrors the
reference's bottom-up batch processor loop with its stuck-round guard
(``blarify/documentation/utils/bottom_up_batch_processor.py:184-246``).
"""

from __future__ import annotations

from .config import PipelineConfig
from .minhash import band_hashes_batch, make_perms, signatures_batch
from .text import char_shingles, jaccard


class UnionFind:
    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        while p != x:
            self.parent[x] = p = self.parent.setdefault(p, p)
            x = p
            p = self.parent[x]
        return x

    def union(self, a: str, b: str) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # deterministic: smaller string becomes root
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra


def lsh_buckets(keys: list[str], cfg: PipelineConfig) -> dict[tuple[int, int], list[str]]:
    """(band_id, band_hash) → member keys. Shared blocking primitive
    (batch-vectorized signature + banding — one numpy pass over all
    keys, bit-identical to the per-key formulation)."""
    a, b = make_perms(cfg.minhash_perms)
    sigs = signatures_batch(keys, cfg.shingle_k, a, b)
    bands = band_hashes_batch(sigs, cfg.lsh_bands)
    buckets: dict[tuple[int, int], list[str]] = {}
    for i, k in enumerate(keys):
        row = bands[i]
        for band_id in range(bands.shape[1]):
            buckets.setdefault((band_id, int(row[band_id])), []).append(k)
    return buckets


def pair_scorer(keys: list[str], cfg: PipelineConfig):
    """(score_fn, threshold) for the configured ResolverMode — JACCARD:
    exact char-shingle Jaccard; EMBEDDING: cosine over deterministic
    feature-hashed shingle embeddings (the model-based linker path for
    unresolved surfaces, swappable for a learned encoder); AUTO: the
    fallback chain (``hybrid_resolver.py:20-27,71-116`` analog) —
    dictionary-accepted pairs score ``1 + jaccard`` so they strictly
    outrank every embedding-fallback pair (cosine ≤ 1) in the downstream
    per-surface argmax, and dictionary-rejected pairs fall back to the
    cosine against ``embed_link_threshold``. Shared by the serial spec
    and the distributed stage so both score identically."""
    from .config import ResolverMode

    if cfg.resolver_mode == ResolverMode.EMBEDDING:
        from .text import embed_cosine, shingle_embed

        emb = {k: shingle_embed(k, cfg.shingle_k) for k in keys}
        return (lambda x, y: round(embed_cosine(emb[x], emb[y]), 9)), cfg.embed_link_threshold
    if cfg.resolver_mode == ResolverMode.AUTO:
        from .text import embed_cosine, shingle_embed

        sha = {k: char_shingles(k, cfg.shingle_k) for k in keys}
        aemb: dict[str, object] = {}

        def ascore(x: str, y: str) -> float:
            j = jaccard(sha[x], sha[y])
            if j >= cfg.jaccard_threshold:
                return 1.0 + j  # dictionary hit: beats any cosine (≤ 1)
            ex = aemb.get(x)
            if ex is None:
                ex = aemb[x] = shingle_embed(x, cfg.shingle_k)
            ey = aemb.get(y)
            if ey is None:
                ey = aemb[y] = shingle_embed(y, cfg.shingle_k)
            return round(embed_cosine(ex, ey), 9)

        return ascore, cfg.embed_link_threshold
    sh = {k: char_shingles(k, cfg.shingle_k) for k in keys}
    return (lambda x, y: jaccard(sh[x], sh[y])), cfg.jaccard_threshold


def verified_pairs(
    unk_norms: set[str], known_norms: set[str], cfg: PipelineConfig
) -> list[tuple[str, str, float]]:
    """Jaccard-verified candidate pairs (x, y, j) with ≥1 unknown side;
    x < y lexicographically."""
    keys = sorted(unk_norms | known_norms)
    score, threshold = pair_scorer(keys, cfg)
    # int encoding of keys → pair-dedup set of packed int64s (an order of
    # magnitude cheaper than hashing string tuples across the ~10^7
    # bucket-pair slots the 32 bands generate)
    idx = {k: i for i, k in enumerate(keys)}
    n = len(keys)
    is_unk = [k in unk_norms for k in keys]
    seen: set[int] = set()
    out: list[tuple[str, str, float]] = []
    for members in lsh_buckets(keys, cfg).values():
        if len(members) < 2 or len(members) > cfg.max_lsh_bucket:
            continue
        mi = [idx[m] for m in members]
        unks_i = [i for i in mi if is_unk[i]]
        if not unks_i:
            continue
        for u in unks_i:
            for v in mi:
                if v == u:
                    continue
                x, y = (u, v) if u < v else (v, u)
                code = x * n + y
                if code in seen:
                    continue
                seen.add(code)
                kx, ky = keys[x], keys[y]
                j = score(kx, ky)
                if j >= threshold:
                    out.append((kx, ky, j))
    return sorted(out)


def canonicalize_surfaces(
    unk_norms: set[str],
    known_norm_to_name: dict[str, tuple[str, str]],  # norm → (canonical name, etype)
    cfg: PipelineConfig,
) -> dict[str, tuple[str, str, bool]]:
    """unknown norm surface → (canonical name, etype, is_new_entity)."""
    known_set = set(known_norm_to_name)
    pairs = verified_pairs(unk_norms, known_set, cfg)

    # best known attachment per unknown: (j, known) with max j, tie → min known
    best: dict[str, tuple[float, str]] = {}
    uf = UnionFind()
    for x, y, j in pairs:
        if y in known_set and x in known_set:
            continue
        if x in known_set or y in known_set:
            u, k = (y, x) if x in known_set else (x, y)
            cur = best.get(u)
            if cur is None or (j, _neg(k)) > (cur[0], _neg(cur[1])):
                best[u] = (j, k)
        else:
            uf.union(x, y)

    comps: dict[str, list[str]] = {}
    for u in unk_norms:
        comps.setdefault(uf.find(u), []).append(u)

    out: dict[str, tuple[str, str, bool]] = {}
    for members in comps.values():
        atts = [best[m] for m in members if m in best]
        if atts:
            j, k = max(atts, key=lambda t: (t[0], _neg(t[1])))
            name, etype = known_norm_to_name[k]
            for m in members:
                out[m] = (name, etype, False)
        else:
            root = min(members)
            for m in members:
                out[m] = (root, "UNK", True)
    return out


class _neg:
    """Wrapper giving strings a REVERSED comparison so that
    (max j, min lexicographic) composes as a single max()."""

    __slots__ = ("s",)

    def __init__(self, s: str):
        self.s = s

    def __lt__(self, other: "_neg") -> bool:
        return self.s > other.s

    def __gt__(self, other: "_neg") -> bool:
        return self.s < other.s

    def __eq__(self, other: object) -> bool:
        return isinstance(other, _neg) and self.s == other.s
