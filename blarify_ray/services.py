"""Pluggable external-service boundary for the documentation layer —
Summarizer / Embedder ABCs with batching, retry/backoff and a fallback
chain, mirroring the reference's service semantics:

- ``blarify/services/embedding_service.py:13-95`` — batched embedding
  calls with retry/backoff around a remote API;
- ``blarify/agents/llm_provider.py:53-170`` — a provider fallback chain
  that rotates to the next provider when one keeps failing.

The offline impls (``TemplateSummarizer``, ``HashEmbedder``) are
deterministic stubs (no network in this sandbox, clearly marked); a real
deployment plugs API-backed subclasses in without touching the Ray
stages — the actor-pool builder only sees the ABC surface. Instances are
cloudpickled into ``map_batches`` actors, so impls must be picklable and
any per-process state (HTTP session, model weights) belongs in
``_setup()``, which runs lazily once per actor."""

from __future__ import annotations

import hashlib
import time
from abc import ABC, abstractmethod
from dataclasses import dataclass

import numpy as np


class ServiceError(RuntimeError):
    """A provider failed after exhausting its retries."""


@dataclass(frozen=True)
class RetryPolicy:
    """Exponential backoff: attempt i (0-based) sleeps
    ``base * mult**i`` before retrying — the reference's retry shape
    (``embedding_service.py:41-68``)."""

    max_attempts: int = 3
    backoff_base_s: float = 0.05
    backoff_mult: float = 2.0


def call_with_retries(fn, policy: RetryPolicy):
    """Run ``fn()`` under ``policy``; re-raises the last error wrapped in
    ``ServiceError`` once attempts are exhausted."""
    last: Exception | None = None
    for attempt in range(policy.max_attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 — provider errors are opaque
            last = e
            if attempt + 1 < policy.max_attempts and policy.backoff_base_s > 0:
                time.sleep(policy.backoff_base_s * policy.backoff_mult**attempt)
    raise ServiceError(f"provider failed after {policy.max_attempts} attempts") from last


class Summarizer(ABC):
    """Batch summarization service. Subclasses implement
    ``_summarize_batch``; callers use ``summarize_batch``, which adds
    retry/backoff. ``fingerprint()`` feeds the doc-layer checkpoint
    lineage, so swapping impls invalidates the cached layer."""

    retry: RetryPolicy = RetryPolicy()
    _ready = False

    def _setup(self) -> None:
        """Once-per-actor initialization hook (client, weights)."""

    def summarize_batch(self, rows: list[dict]) -> list[str]:
        if not self._ready:
            self._setup()
            self._ready = True
        out = call_with_retries(lambda: self._summarize_batch(rows), self.retry)
        if len(out) != len(rows):
            raise ServiceError(
                f"summarizer returned {len(out)} summaries for {len(rows)} rows"
            )
        return out

    @abstractmethod
    def _summarize_batch(self, rows: list[dict]) -> list[str]: ...

    def fingerprint(self) -> str:
        return type(self).__qualname__


class Embedder(ABC):
    """Batch embedding service (``embedding_service.py:13-95`` surface):
    ``embed_batch(texts) -> float32[len(texts), dim]``, retried."""

    dim: int
    retry: RetryPolicy = RetryPolicy()
    _ready = False

    def _setup(self) -> None:
        """Once-per-actor initialization hook."""

    def embed_batch(self, texts: list[str]) -> np.ndarray:
        if not self._ready:
            self._setup()
            self._ready = True
        out = call_with_retries(lambda: self._embed_batch(texts), self.retry)
        out = np.asarray(out, dtype=np.float32)
        if out.shape != (len(texts), self.dim):
            raise ServiceError(
                f"embedder returned shape {out.shape}, want ({len(texts)}, {self.dim})"
            )
        return out

    @abstractmethod
    def _embed_batch(self, texts: list[str]) -> np.ndarray: ...

    def fingerprint(self) -> str:
        return f"{type(self).__qualname__}/d{self.dim}"


class SummarizerChain(Summarizer):
    """Provider fallback chain (``llm_provider.py:53-170``): each batch
    tries providers in order; a provider that exhausts its retries is
    skipped for that batch and the next one is tried. Raises only when
    every provider fails."""

    def __init__(self, providers: list[Summarizer]):
        if not providers:
            raise ValueError("empty provider chain")
        self.providers = providers

    def _summarize_batch(self, rows: list[dict]) -> list[str]:
        last: Exception | None = None
        for p in self.providers:
            try:
                return p.summarize_batch(rows)
            except ServiceError as e:
                last = e
        raise ServiceError("every provider in the chain failed") from last

    def summarize_batch(self, rows: list[dict]) -> list[str]:
        # the chain IS the retry structure — don't re-wrap it
        return self._summarize_batch(rows)

    def fingerprint(self) -> str:
        return "chain(" + ",".join(p.fingerprint() for p in self.providers) + ")"


class TemplateSummarizer(Summarizer):
    """OFFLINE STUB for the reference's LLM node summarizer
    (``bottom_up_batch_processor.py:86-246``): a deterministic template
    over the entity row — no model call, clearly marked."""

    def _summarize_batch(self, rows: list[dict]) -> list[str]:
        out = []
        for r in rows:
            alias_str = ", ".join(a for a in r["aliases"][:5] if a != r["name"])
            base = f"{r['type']} entity '{r['name']}'"
            if alias_str:
                base += f" (also known as: {alias_str})"
            out.append(base + f"; {r['n_mentions']} mentions in the corpus.")
        return out


class HashEmbedder(Embedder):
    """OFFLINE STUB for the reference's embedding API: sha256-seeded
    pseudo-vectors, L2-normalized — deterministic, no network."""

    def __init__(self, dim: int = 64):
        self.dim = dim

    def _embed_batch(self, texts: list[str]) -> np.ndarray:
        out = np.empty((len(texts), self.dim), dtype=np.float32)
        nbytes = self.dim * 4
        for i, text in enumerate(texts):
            d = hashlib.sha256(text.encode("utf-8")).digest()
            raw = np.frombuffer((d * (nbytes // len(d) + 1))[:nbytes], dtype=np.uint8)
            v = raw[: self.dim].astype(np.float64) - 127.5
            n = np.linalg.norm(v)
            out[i] = (v / (n if n else 1.0)).astype(np.float32)
        return out
