"""Extraction rules: gazetteer NER, heuristic proper-noun NER, and the
predicate-pattern table for triple extraction.

Pure, deterministic, shared by the serial golden reference
(``serial.py``) and the Ray stages (``stages/``) — the analog of
blarify's pluggable per-language ``LanguageDefinitions``
(``blarify/code_hierarchy/languages/language_definitions.py:21-109``):
``Gazetteer.find_mentions`` ≅ the identifier scan
(``tree_sitter_helper.py:34-48``), ``classify_connector`` ≅
``get_reference_type``'s {node_type → RelationshipType} map
(``python_definitions.py:61-76``).

The Gazetteer is expensive to build (compiled alternation regex) → in
the Ray pipeline it is constructed ONCE per actor in ``__init__``
(actor-pool pattern ≅ the LSP server pool, ``lsp_helper.py:205-244``).
At real gazetteer scale the alternation regex would be replaced by an
Aho-Corasick automaton; the interface stays the same.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .corpus import Entity
from .langs import EN, LanguageDefinitions
from .text import normalize_surface

# backwards-compatible alias: the English connector table now lives in
# the language registry (langs.py)
CONNECTOR_TO_PRED: dict[str, str] = EN.connector_to_pred

# Capitalized-token sequences (>=2 tokens, allowing initials like "A.") or
# ALLCAPS acronyms — the open-world mention detector for surfaces missing
# from the gazetteer (typos, novel entities). Language-neutral; the
# per-language boilerplate exclusion comes from the registry.
_RE_PROPER = re.compile(
    r"\b[A-Z][a-zA-Z0-9]*\.?(?:[ ][A-Z][a-zA-Z0-9]*\.?)+|\b[A-Z]{2,}\b"
)


@dataclass(frozen=True)
class Mention:
    start: int
    end: int
    surface: str
    ner_type: str  # entity type from gazetteer, or "UNK" for heuristic hits


_RE_TOKEN = re.compile(r"[A-Za-z0-9]+\.?")


class Gazetteer:
    """Alias dictionary + token-indexed leftmost-longest matcher.

    ``alias_map``: normalized surface → sorted tuple of candidate entity
    idx (ambiguity preserved — acronyms collide by construction, the
    duplicate_names analog). Resolution happens in the link stage.

    Matching is O(sentence_tokens × aliases_sharing_first_token), not
    O(sentence_len × total_aliases) — a dict on the first normalized
    token plays the role an Aho-Corasick automaton would at full
    gazetteer scale.
    """

    def __init__(self, entities: tuple[Entity, ...] | list[Entity]):
        self.entities = tuple(entities)
        alias_map: dict[str, list[int]] = {}
        token_seqs: set[tuple[str, ...]] = set()
        for e in self.entities:
            for a in e.aliases:
                norm = normalize_surface(a)
                alias_map.setdefault(norm, []).append(e.idx)
                toks = tuple(norm.split())
                if toks:
                    token_seqs.add(toks)
        self.alias_map: dict[str, tuple[int, ...]] = {
            k: tuple(sorted(set(v))) for k, v in alias_map.items()
        }
        # multi-token sequences indexed by their first TWO tokens (a
        # single-token prefix like "global" would otherwise fan out to
        # hundreds of candidates per occurrence); single-token aliases in
        # their own set. Longest-first within a pair key.
        self._singles: set[str] = {seq[0] for seq in token_seqs if len(seq) == 1}
        tmp: dict[tuple[str, str], list[tuple[str, ...]]] = {}
        for seq in token_seqs:
            if len(seq) >= 2:
                tmp.setdefault((seq[0], seq[1]), []).append(seq)
        self._by_pair: dict[tuple[str, str], tuple[tuple[str, ...], ...]] = {
            k: tuple(sorted(seqs, key=lambda s: (-len(s), s))) for k, seqs in tmp.items()
        }

    def candidates(self, surface: str) -> tuple[int, ...]:
        return self.alias_map.get(normalize_surface(surface), ())

    def find_mentions(self, sentence: str, defs: LanguageDefinitions = EN) -> list[Mention]:
        """Gazetteer matches (leftmost-longest, non-overlapping), then
        heuristic proper-noun spans on the uncovered remainder.
        Boilerplate sentences (copyright footers, nav chrome — per-lang
        pattern) never feed the open-world detector: they otherwise mint
        spurious UNK entities from site chrome on every page."""
        toks = [(m.start(), m.end(), m.group(0).rstrip(".").lower()) for m in _RE_TOKEN.finditer(sentence)]
        out: list[Mention] = []
        covered: list[tuple[int, int]] = []
        i, n = 0, len(toks)
        while i < n:
            matched_seq = None
            if i + 1 < n:
                seqs = self._by_pair.get((toks[i][2], toks[i + 1][2]))
                if seqs:
                    for seq in seqs:  # longest first
                        j = i + len(seq)
                        if j <= n and all(toks[i + k][2] == seq[k] for k in range(2, len(seq))):
                            matched_seq = seq
                            break
            if matched_seq is None and toks[i][2] in self._singles:
                matched_seq = (toks[i][2],)
            if matched_seq is not None:
                j = i + len(matched_seq)
                start, end = toks[i][0], toks[j - 1][1]
                surface = sentence[start:end]
                cands = self.alias_map.get(" ".join(matched_seq), ())
                etype = (
                    self.entities[cands[0]].etype
                    if len(cands) == 1
                    else ("AMBIG" if cands else "UNK")
                )
                out.append(Mention(start, end, surface, etype))
                covered.append((start, end))
                i = j
            else:
                i += 1
        if not defs.boilerplate_re.search(sentence):
            for m in _RE_PROPER.finditer(sentence):
                s, e = m.start(), m.end()
                if any(not (e <= cs or s >= ce) for cs, ce in covered):
                    continue
                out.append(Mention(s, e, m.group(0), "UNK"))
        out.sort(key=lambda x: x.start)
        return out


def classify_connector(connector: str, defs: LanguageDefinitions = EN) -> str | None:
    """Predicate for the text strictly between two adjacent mentions;
    None when no rule matches (≅ default-USES fallback is deliberately
    NOT emitted — unmatched pairs produce no triple). The phrase table
    comes from the language registry (``langs.py``), the
    {node_type → RelationshipType} map analog
    (``python_definitions.py:61-76``)."""
    return defs.connector_to_pred.get(connector.strip())


def extract_triples_from_sentence(
    sentence: str, mentions: list[Mention], defs: LanguageDefinitions = EN
) -> list[tuple[Mention, str, Mention]]:
    """Adjacent-mention-pair rule: for consecutive mentions (no mention in
    between), classify the connector. Ordering is positional (start
    offset), mirroring the reference's (startLine, referenceCharacter)
    ordering (``queries.py:1329-1334``)."""
    out = []
    for a, b in zip(mentions, mentions[1:]):
        pred = classify_connector(sentence[a.end : b.start], defs)
        if pred is not None:
            out.append((a, pred, b))
    return out
