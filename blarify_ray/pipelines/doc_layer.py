"""Documentation layer — the reference's derived LLM/embedding layer
re-expressed for the web-KG: one DocumentationNode-shaped row per
entity with a content summary and a content embedding
(``blarify/graph/node/documentation_node.py:17-68``,
``blarify/services/embedding_service.py``).

The LLM/embedding calls are external services in the reference; here the
embedding model is STUBBED with a deterministic hash embedding (clearly
marked) so the Ray-side plumbing — actor pool, content-hash dedup
before embedding, fixed-size-list vector column, vector search over the
layer — is real and testable offline.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..state.manifest import read_stage
from ..util import pool_size

EMBED_DIM = 64


def hash_embed(text: str) -> np.ndarray:
    """STUB embedding model: sha256-seeded pseudo-vector, L2-normalized.
    Deterministic stand-in for the reference's OpenAI embedding call
    (``embedding_service.py:13-95``)."""
    d = hashlib.sha256(text.encode("utf-8")).digest()
    raw = np.frombuffer((d * ((EMBED_DIM * 4) // len(d) + 1))[: EMBED_DIM * 4], dtype=np.uint8)
    v = raw[:EMBED_DIM].astype(np.float64) - 127.5
    n = np.linalg.norm(v)
    return (v / (n if n else 1.0)).astype(np.float32)


def entity_content(name: str, etype: str, aliases: list[str], n_mentions: int) -> str:
    alias_str = ", ".join(a for a in aliases[:5] if a != name)
    base = f"{etype} entity '{name}'"
    if alias_str:
        base += f" (also known as: {alias_str})"
    return base + f"; {n_mentions} mentions in the corpus."


class DocLayerBuilder:
    """Actor-pool stage: summary text + embedding per entity, with a
    per-actor content-hash cache (embed-once dedup,
    ``embedding_service.py:97-144``)."""

    def __init__(self):
        self._cache: dict[bytes, np.ndarray] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        contents, vecs = [], []
        for name, etype, aliases, n in zip(
            batch["name"].to_pylist(), batch["type"].to_pylist(),
            batch["aliases"].to_pylist(), batch["n_mentions"].to_pylist(),
        ):
            content = entity_content(name, etype, aliases, n)
            key = hashlib.md5(content.encode()).digest()
            v = self._cache.get(key)
            if v is None:
                v = self._cache[key] = hash_embed(content)
            contents.append(content)
            vecs.append(v)
        flat = pa.array(np.concatenate(vecs) if vecs else np.array([], dtype=np.float32), pa.float32())
        return pa.Table.from_pydict(
            {
                "entity_id": batch["entity_id"],
                "name": batch["name"],
                "info_type": pa.array(["entity_summary"] * batch.num_rows, pa.string()),
                "layer": pa.array(["documentation"] * batch.num_rows, pa.string()),
                "content": pa.array(contents, pa.string()),
                "content_embedding": pa.FixedSizeListArray.from_arrays(flat, EMBED_DIM),
            }
        )


def build_doc_layer(
    paths: dict[str, str], cfg: PipelineConfig = DEFAULT_CONFIG
) -> ray.data.Dataset:
    ents = read_stage(paths["entities"], columns=["entity_id", "name", "type", "aliases", "n_mentions"])
    return ents.map_batches(
        DocLayerBuilder,
        batch_format="pyarrow",
        batch_size=1024,
        concurrency=pool_size(4),
        num_cpus=1,
    )


def doc_search(
    paths: dict[str, str], query_text: str, k: int = 10,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> ray.data.Dataset:
    """Vector search over the documentation layer: embed the query with
    the same (stub) model, brute-force cosine top-k
    (``queries.py:2298-2356`` analog)."""
    import pyarrow.compute as pc  # noqa: F401

    q = hash_embed(query_text).astype(np.float64)
    layer = build_doc_layer(paths, cfg)

    def score(t: pa.Table) -> pa.Table:
        m = np.array(t["content_embedding"].to_pylist(), dtype=np.float64)
        sims = m @ q
        return pa.Table.from_pydict(
            {
                "entity_id": t["entity_id"],
                "name": t["name"],
                "score": pa.array(np.round(sims, 6)),
            }
        )

    return layer.map_batches(score, batch_format="pyarrow").sort(
        ["score", "entity_id"], descending=[True, False]
    ).limit(k)


def doc_search_hybrid(
    paths: dict[str, str], query_text: str, k: int = 10,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    w_vector: float = 0.7, w_keyword: float = 0.3,
) -> ray.data.Dataset:
    """Hybrid vector+keyword search over the documentation layer:
    ``score = 0.7·cosine + 0.3·keyword`` with a name/title boost —
    the reference's combined scoring
    (``blarify/repositories/graph_db_manager/queries.py:2322-2356``:
    vector similarity blended with keyword hits, title matches boosted
    over content matches).

    Keyword score per entity = (2·name_hits + content_hits) / (2·terms),
    clipped to 1 — a term matching the entity NAME counts double
    (title boost), a term matching only the summary content counts once;
    the /(2·terms) normalization makes an all-name-hit query score
    exactly 1.0.
    """
    from ..text import normalize_surface

    q = hash_embed(query_text).astype(np.float64)
    terms = [t for t in normalize_surface(query_text).split() if len(t) >= 3]
    layer = build_doc_layer(paths, cfg)

    def score(t: pa.Table) -> pa.Table:
        m = np.array(t["content_embedding"].to_pylist(), dtype=np.float64)
        cos = m @ q if len(m) else np.zeros(0)
        kws = []
        for name, content in zip(t["name"].to_pylist(), t["content"].to_pylist()):
            if not terms:
                kws.append(0.0)
                continue
            nl, cl = normalize_surface(name), normalize_surface(content)
            hits = 0
            for term in terms:
                if term in nl:
                    hits += 2  # title/name boost
                elif term in cl:
                    hits += 1
            kws.append(min(1.0, hits / (2.0 * len(terms))))
        hybrid = w_vector * cos + w_keyword * np.asarray(kws)
        return pa.Table.from_pydict(
            {
                "entity_id": t["entity_id"],
                "name": t["name"],
                "score": pa.array(np.round(hybrid, 6)),
                "vector_score": pa.array(np.round(cos, 6)),
                "keyword_score": pa.array(np.round(np.asarray(kws), 6)),
            }
        )

    return layer.map_batches(score, batch_format="pyarrow").sort(
        ["score", "entity_id"], descending=[True, False]
    ).limit(k)
