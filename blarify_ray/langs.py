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

# Further registered languages, same predicate vocabulary — the
# reference registers ~10 language definitions the same way
# (``project_graph_creator.py:42-53``); each entry is one connector
# table + one boilerplate pattern, everything else stays shared.
FR = LanguageDefinitions(
    lang="fr",
    connector_to_pred={
        "a été fondée par": "FOUNDED_BY",
        "a son siège à": "LOCATED_IN",
        "travaille pour": "WORKS_FOR",
        # lowercase on purpose: a capitalized token inside a connector
        # would itself match the proper-noun mention detector and break
        # the adjacent-pair rule, so the phrase could never fire
        "est à la tête de": "CEO_OF",
        "a racheté": "ACQUIRED",
        "est une filiale de": "PART_OF",
        "fabrique": "MAKES",
        "est partenaire de": "PARTNER_OF",
        "est né à": "BORN_IN",
    },
    boilerplate_re=re.compile(r"©|\(c\)\s*\d{4}|tous droits réservés", re.I),
)

ES = LanguageDefinitions(
    lang="es",
    connector_to_pred={
        "fue fundada por": "FOUNDED_BY",
        "tiene su sede en": "LOCATED_IN",
        "trabaja para": "WORKS_FOR",
        "es el director general de": "CEO_OF",
        "adquirió": "ACQUIRED",
        "es una filial de": "PART_OF",
        "fabrica": "MAKES",
        "es socio de": "PARTNER_OF",
        "nació en": "BORN_IN",
    },
    boilerplate_re=re.compile(r"©|\(c\)\s*\d{4}|todos los derechos reservados", re.I),
)

IT = LanguageDefinitions(
    lang="it",
    connector_to_pred={
        "è stata fondata da": "FOUNDED_BY",
        "ha sede a": "LOCATED_IN",
        "lavora per": "WORKS_FOR",
        "è amministratore delegato di": "CEO_OF",
        "ha acquisito": "ACQUIRED",
        "è una controllata di": "PART_OF",
        "produce": "MAKES",
        "è partner di": "PARTNER_OF",
        "è nato a": "BORN_IN",
    },
    boilerplate_re=re.compile(r"©|\(c\)\s*\d{4}|tutti i diritti riservati", re.I),
)

PT = LanguageDefinitions(
    lang="pt",
    connector_to_pred={
        "foi fundada por": "FOUNDED_BY",
        "tem sede em": "LOCATED_IN",
        "trabalha para": "WORKS_FOR",
        "é o diretor executivo de": "CEO_OF",
        "adquiriu": "ACQUIRED",
        "é uma subsidiária de": "PART_OF",
        "fabrica": "MAKES",
        "é parceira de": "PARTNER_OF",
        "nasceu em": "BORN_IN",
    },
    boilerplate_re=re.compile(r"©|\(c\)\s*\d{4}|todos os direitos reservados", re.I),
)

NL = LanguageDefinitions(
    lang="nl",
    connector_to_pred={
        "werd opgericht door": "FOUNDED_BY",
        "is gevestigd in": "LOCATED_IN",
        "werkt voor": "WORKS_FOR",
        "is directeur van": "CEO_OF",
        "nam over": "ACQUIRED",
        "is een dochteronderneming van": "PART_OF",
        "maakt": "MAKES",
        "is partner van": "PARTNER_OF",
        "is geboren in": "BORN_IN",
    },
    boilerplate_re=re.compile(r"©|\(c\)\s*\d{4}|alle rechten voorbehouden", re.I),
)

REGISTRY: dict[str, LanguageDefinitions] = {
    d.lang: d for d in (EN, DE, FR, ES, IT, PT, NL)
}


def register(defs: LanguageDefinitions) -> None:
    """Add (or replace) a language's definitions."""
    REGISTRY[defs.lang] = defs


def for_lang(lang: str) -> LanguageDefinitions | None:
    """Definitions for ``lang``; None → RAW passthrough."""
    return REGISTRY.get(lang)
