"""Per-language extraction definitions — the pluggable registry proving
the ``LanguageDefinitions`` extension point
(``blarify/code_hierarchy/languages/language_definitions.py:21-109``:
an ABC per language with its node-type → relationship map, registered in
a lang → definitions table consulted at parse time).

A language here owns (a) the connector-phrase → predicate table used by
triple extraction and (b) the boilerplate pattern excluded from
open-world mention detection. Tokenization, gazetteer matching and
sentence splitting are language-neutral and stay shared.

Routing: a page's ``lang`` column selects the definitions; langs absent
from the registry (or from ``cfg.supported_langs``) fall back to RAW
passthrough (``FallbackDefinitions``, ``tree_sitter_helper.py:83-91``).
Both the serial spec and the Ray stages resolve through this registry,
so registering a new language keeps the two paths exactly equal by
construction.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .corpus import PREDICATES


@dataclass(frozen=True)
class LanguageDefinitions:
    lang: str
    # connector phrase (stripped text strictly between two mentions) → predicate
    connector_to_pred: dict[str, str]
    # sentences matching this never feed the open-world mention detector
    boilerplate_re: re.Pattern


EN = LanguageDefinitions(
    lang="en",
    connector_to_pred={phrase: pred for pred, _s, _o, phrase in PREDICATES},
    boilerplate_re=re.compile(r"©|\(c\)\s*\d{4}|all rights reserved", re.I),
)

# German connector phrases for the same predicate vocabulary — the
# second registered language exercising the extension point end-to-end.
DE = LanguageDefinitions(
    lang="de",
    connector_to_pred={
        "wurde gegründet von": "FOUNDED_BY",
        "hat ihren Sitz in": "LOCATED_IN",
        "arbeitet für": "WORKS_FOR",
        "ist Geschäftsführer von": "CEO_OF",
        "übernahm": "ACQUIRED",
        "ist eine Tochtergesellschaft von": "PART_OF",
        "entwickelt": "MAKES",
        "kooperiert mit": "PARTNER_OF",
        "wurde geboren in": "BORN_IN",
    },
    boilerplate_re=re.compile(r"©|\(c\)\s*\d{4}|alle rechte vorbehalten", re.I),
)

REGISTRY: dict[str, LanguageDefinitions] = {d.lang: d for d in (EN, DE)}


def register(defs: LanguageDefinitions) -> None:
    """Add (or replace) a language's definitions."""
    REGISTRY[defs.lang] = defs


def for_lang(lang: str) -> LanguageDefinitions | None:
    """Definitions for ``lang``; None → RAW passthrough."""
    return REGISTRY.get(lang)
