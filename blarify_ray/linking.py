"""Entity-linking semantics, shared by serial golden and Ray stage.

Analog of the reference's two-step SCIP reference resolution
(``blarify/code_references/scip_helper.py:748-923``): (a) surface →
candidate entities via the alias dictionary, (b) page-context
disambiguation for ambiguous aliases (acronym collisions — the
``duplicate_names/`` case). Deterministic tie-breaks throughout.
"""

from __future__ import annotations

from .rules import Gazetteer, Mention
from .text import normalize_surface


def known_alias_norms(gaz: Gazetteer) -> dict[str, tuple[str, str]]:
    """All UNAMBIGUOUS alias norms → (canonical name, etype) — the known
    side of the canonicalization node set. Ambiguous acronyms are
    excluded: a typo'd acronym must not attach to an arbitrary candidate."""
    out: dict[str, tuple[str, str]] = {}
    for norm, cands in gaz.alias_map.items():
        if len(cands) == 1:
            e = gaz.entities[cands[0]]
            out[norm] = (e.name, e.etype)
    return out


def resolve_mention_keys(
    gaz: Gazetteer, page_mentions: list[Mention]
) -> list[tuple[str, str, bool]]:
    """For every mention on ONE page return (key, type, resolved).

    - unique alias → (canonical name, etype, True)
    - ambiguous alias → candidate whose entity also has an unambiguous
      mention on the same page; ties and no-context default to the
      lowest entity idx (deterministic)
    - unknown surface → (normalized surface, "UNK", False); the
      canonicalization stage owns it
    """
    page_unambig: set[int] = set()
    for m in page_mentions:
        cands = gaz.candidates(m.surface)
        if len(cands) == 1:
            page_unambig.add(cands[0])

    out: list[tuple[str, str, bool]] = []
    for m in page_mentions:
        cands = gaz.candidates(m.surface)
        if len(cands) == 1:
            e = gaz.entities[cands[0]]
            out.append((e.name, e.etype, True))
        elif cands:
            ctx = sorted(set(cands) & page_unambig)
            idx = ctx[0] if ctx else min(cands)
            e = gaz.entities[idx]
            out.append((e.name, e.etype, True))
        else:
            out.append((normalize_surface(m.surface), "UNK", False))
    return out
