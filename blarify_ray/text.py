"""Pure text functions shared by the serial golden reference and the Ray
pipeline — the single-implementation rule that guarantees byte-identical
extracted text per url across both paths (BASELINE.md correctness target;
analog of the reference's single parse path in
``blarify/code_hierarchy/tree_sitter_helper.py:72-175``).

Everything here is deterministic: no locale, no dict-order, no clocks.
"""

from __future__ import annotations

import hashlib
import html as _html
import re

# --- HTML → text -----------------------------------------------------------

_RE_SCRIPT = re.compile(rb"<script\b.*?</script\s*>", re.S | re.I)
_RE_STYLE = re.compile(rb"<style\b.*?</style\s*>", re.S | re.I)
_RE_COMMENT = re.compile(rb"<!--.*?-->", re.S)
_BLOCK_TAGS = (
    "p|div|br|li|ul|ol|h1|h2|h3|h4|h5|h6|tr|table|section|article|header|"
    "footer|nav|blockquote|title|main|aside"
)
_RE_BLOCK = re.compile(r"</?(?:%s)\b[^>]*>" % _BLOCK_TAGS, re.I)
_RE_TAG = re.compile(r"<[^>]+>")
_RE_HSPACE = re.compile(r"[ \t\r\f\v]+")


def html_to_text(raw: bytes) -> str:
    """Trafilatura-style (but fully deterministic) HTML → text.

    Decode policy follows the reference: utf-8 with errors ignored
    (``tree_sitter_helper.py:124-130``). Block-level tags become newlines,
    all other tags are stripped, entities unescaped, whitespace normalized
    to single spaces within lines; blank lines dropped.
    """
    if not raw:
        return ""
    b = _RE_SCRIPT.sub(b" ", raw)
    b = _RE_STYLE.sub(b" ", b)
    b = _RE_COMMENT.sub(b" ", b)
    s = b.decode("utf-8", errors="ignore")
    s = _RE_BLOCK.sub("\n", s)
    s = _RE_TAG.sub(" ", s)
    s = _html.unescape(s)
    lines = []
    for line in s.split("\n"):
        line = _RE_HSPACE.sub(" ", line).strip()
        if line:
            lines.append(line)
    return "\n".join(lines)


def text_sha256(text: str) -> bytes:
    return hashlib.sha256(text.encode("utf-8")).digest()


# --- sentence split --------------------------------------------------------

_RE_SENT_SPLIT = re.compile(r"(?<=[.!?])(?<![A-Z]\.)\s+")


def split_sentences(text: str) -> list[str]:
    """Deterministic sentence split: newline is a hard boundary, then
    split after [.!?] whitespace — except after a capital-letter
    abbreviation ("A. Almeida", "GDS.") to keep initials intact.
    Empty sentences dropped."""
    out: list[str] = []
    for line in text.split("\n"):
        for sent in _RE_SENT_SPLIT.split(line):
            sent = sent.strip()
            if sent:
                out.append(sent)
    return out


# --- surface normalization / shingles (canonicalization support) ----------

_RE_NONWORD = re.compile(r"[^a-z0-9 ]+")


def normalize_surface(surface: str) -> str:
    """Lowercase, strip punctuation, collapse spaces — the key used for
    alias-dictionary lookup (analog of SCIP symbol normalization,
    ``scip_helper.py:875-923``)."""
    s = surface.lower()
    s = _RE_NONWORD.sub(" ", s)
    return " ".join(s.split())


def char_shingles(s: str, k: int = 3) -> set[str]:
    """Character k-shingles of the normalized string (padded)."""
    s = f"^{s}$"
    if len(s) <= k:
        return {s}
    return {s[i : i + k] for i in range(len(s) - k + 1)}


def jaccard(a: set[str], b: set[str]) -> float:
    if not a and not b:
        return 1.0
    inter = len(a & b)
    return inter / (len(a) + len(b) - inter)


def shingle_embed(s: str, k: int = 3, dim: int = 64):
    """Deterministic feature-hashed shingle embedding (L2-normalized) —
    the offline stand-in for a learned surface-form encoder in
    ``ResolverMode.EMBEDDING``: each char-k-shingle hashes to a signed
    dimension, so edit-near strings land at high cosine (unlike a
    content-hash embedding, which is orthogonal under any edit)."""
    import hashlib as _h

    import numpy as np

    v = np.zeros(dim, dtype=np.float64)
    for sh in char_shingles(s, k):
        d = _h.md5(sh.encode("utf-8")).digest()
        idx = d[0] % dim
        v[idx] += 1.0 if d[1] & 1 else -1.0
    n = np.linalg.norm(v)
    return v / n if n else v


def embed_cosine(a, b) -> float:
    return float(a @ b)


# --- edge evidence snippet -------------------------------------------------

SCOPE_SNIPPET_MAX = 200


def scope_snippet(sentence: str, max_len: int = SCOPE_SNIPPET_MAX) -> str:
    """Capped evidence snippet carried on edges (Relationship.scope_text
    analog, ``blarify/graph/relationship/relationship.py:8-33``).
    Deterministic truncation — applied identically by the serial spec and
    the Ray stages at capture time."""
    return sentence if len(sentence) <= max_len else sentence[:max_len]


# --- tokenization (text-analysis ops) --------------------------------------

_RE_WS = re.compile(r"\s+")
# BPE-ish word/number/punct splitter for token counting.
_RE_BPEISH = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]")


def ws_tokens(text: str) -> list[str]:
    t = text.strip()
    return _RE_WS.split(t) if t else []


def bpeish_tokens(text: str) -> list[str]:
    return _RE_BPEISH.findall(text)
