"""Deterministic synthetic Common-Crawl-style page corpus.

``BASELINE.json`` ``input_hint`` fixes the input shape:
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)``. No external data exists in the sandbox, so the corpus is
synthesized as a **pure function of (seed, page index)** — identical
across processes, parallelism levels and reruns. This mirrors the
reference's deterministic fixture corpora (``tests/code_examples/``,
FIXTURES.md §2): alias collisions (acronyms shared by two orgs ↔
``duplicate_names/``), relation chains, a hot entity on ~30% of pages,
dirty rows (broken UTF-8, empty html, oversized page, unsupported lang ↔
``test_graphbuilder_edge_cases.py``) and duplicate urls at two crawl
timestamps (latest wins ↔ incremental update,
``prebuilt/graph_builder.py:138-225``).

Every page embeds known entity mentions and relation sentences, so the
expected mention/triple/entity output is computable by construction
(``expected_triples``), giving the tests an absolute ground truth in
addition to the serial-reference golden.
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from functools import lru_cache

CORPUS_SEED = 42
BASE_TS_US = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z in microseconds

# Dirty-row cadences (logical page index i):
DUP_URL_MOD = 37  # i % 37 == 0  → a stale duplicate crawl of the same url
BROKEN_UTF8_MOD = 97  # i % 97 == 13 → invalid byte sequences inside html
EMPTY_HTML_MOD = 89  # i % 89 == 7  → empty html
OVERSIZE_MOD = 101  # i % 101 == 11 → html padded past the size cap (dropped)
RAW_LANG_MOD = 61  # i % 61 == 5  → unsupported lang ("de") → RAW row
HOT_ENTITY_PROB = 0.30  # entity 0 appears on ~30% of pages (skew case)
TYPO_PROB = 0.05  # mention surface typo → only canonicalization merges it

_ADJ = [
    "Global", "United", "Quantum", "Stellar", "Nordic", "Pacific", "Atlas",
    "Vertex", "Crimson", "Solar", "Apex", "Orion", "Delta", "Titan", "Lunar",
    "Amber", "Cobalt", "Ivory", "Onyx", "Zenith", "Argent", "Borealis",
    "Cascade", "Meridian",
]
_NOUN = [
    "Data", "Energy", "Logistics", "Robotics", "Materials", "Networks",
    "Capital", "Biotech", "Semiconductor", "Analytics", "Shipping", "Motors",
    "Foods", "Textiles", "Optics", "Mining", "Software", "Aerospace",
    "Chemicals", "Media", "Telecom", "Pharma", "Fisheries", "Timber",
]
_ORG_SUF = ["Systems", "Group", "Holdings", "Labs", "Industries", "Corp", "Partners", "Works"]
_FIRST = [
    "Alice", "Boris", "Chen", "Dara", "Elena", "Farid", "Grace", "Hiro",
    "Ingrid", "Jonas", "Kavya", "Liam", "Mina", "Noor", "Oscar", "Priya",
    "Quinn", "Rosa", "Samir", "Tessa", "Umar", "Vera", "Wei", "Ximena",
    "Yusuf", "Zara", "Anders", "Bianca", "Carlos", "Dmitri", "Esther", "Felix",
]
_LAST = [
    "Almeida", "Bergstrom", "Castillo", "Dube", "Eriksen", "Fontaine",
    "Garcia", "Haugen", "Ivanov", "Jansen", "Kowalski", "Lindqvist", "Moreau",
    "Nakamura", "Okafor", "Petrov", "Quispe", "Rahman", "Sato", "Tanaka",
    "Ueda", "Varga", "Weber", "Xu", "Yamada", "Zhang", "Abe", "Bauer",
    "Costa", "Dimitrov", "Endo", "Fischer",
]
_PLACE_DIR = ["", "East ", "West ", "North ", "South ", "New ", "Old ", "Port "]
_PLACE_PRE = [
    "North", "South", "East", "West", "Oak", "Elm", "Stone", "River", "Lake",
    "Hill", "Green", "Fair", "Ash", "Birch", "Clear", "Spring", "Winter",
    "Summer", "Iron", "Silver",
]
_PLACE_SUF = [
    "bridge", "field", "haven", "port", "ville", "burg", "ton", "dale",
    "wood", "ford", "gate", "crest", "view", "shore", "brook", "mont",
]
_PROD_A = [
    "Data", "Cloud", "Nano", "Hyper", "Flex", "Omni", "Swift", "Prime",
    "Echo", "Nova", "Pulse", "Core", "Wave", "Grid", "Spark", "Flux",
]
_PROD_B = [
    "Forge", "Engine", "Hub", "Suite", "Box", "Works", "Link", "Stream",
    "Vault", "Scope", "Mesh", "Stack", "Pilot", "Sense", "Drive", "Port",
]

ENTITY_TYPES = ("ORG", "PERSON", "PLACE", "PRODUCT")

# (pred, subj_type, obj_type, connector phrase). The connector is the text
# strictly between the two mentions; the triple-rule table in
# stages/triples.py must classify exactly these (analog of the per-language
# {ts_node_type → RelationshipType} maps, python_definitions.py:61-76).
PREDICATES = [
    ("FOUNDED_BY", "ORG", "PERSON", "was founded by"),
    ("LOCATED_IN", "ORG", "PLACE", "is headquartered in"),
    ("WORKS_FOR", "PERSON", "ORG", "works for"),
    ("CEO_OF", "PERSON", "ORG", "is the chief executive of"),
    ("ACQUIRED", "ORG", "ORG", "acquired"),
    ("PART_OF", "ORG", "ORG", "is a subsidiary of"),
    ("MAKES", "ORG", "PRODUCT", "develops"),
    ("PARTNER_OF", "ORG", "ORG", "partnered with"),
    ("BORN_IN", "PERSON", "PLACE", "was born in"),
]
_PREDS_BY_SUBJ: dict[str, list[tuple[str, str, str, str]]] = {}
for _p in PREDICATES:
    _PREDS_BY_SUBJ.setdefault(_p[1], []).append(_p)

_DISTRACTORS = [
    "{e} announced quarterly results on Tuesday.",
    "Shares of {e} were unchanged in early trading.",
    "{e} declined to comment on the report.",
    "Analysts remain cautious about {e}.",
    "A spokesperson for {e} confirmed the schedule.",
]
_FILLER = [
    "Markets were quiet for most of the session.",
    "The weather stayed mild throughout the week.",
    "Officials said the review would take several months.",
    "No further details were made available.",
    "The committee will reconvene next quarter.",
]

_DOMAINS = [
    "news.example.org", "wire.example.net", "daily.example.com",
    "herald.example.org", "tribune.example.net", "gazette.example.com",
    "journal.example.org", "post.example.net",
]


@dataclass(frozen=True)
class Entity:
    idx: int
    etype: str
    name: str
    aliases: tuple[str, ...]  # includes name; order is deterministic


def _acronym(name: str) -> str:
    return "".join(w[0] for w in name.split() if w[0].isupper())


def _mixed_radix(k: int, *lens: int) -> list[int]:
    """Unique digit tuple for k, with a bijective scramble inside the
    capacity so small k still produce diverse word combinations."""
    cap = 1
    for n in lens:
        cap *= n
    if k < cap:
        k = (k * 2953) % cap  # 2953 is coprime with every capacity used here
    out = []
    for n in lens:
        out.append(k % n)
        k //= n
    out.append(k)
    return out


def make_entity(idx: int) -> Entity:
    """Entity ``idx`` → deterministic (type, name, aliases). Unique names
    by mixed-radix decomposition of the per-type counter; acronym aliases
    intentionally collide across orgs (duplicate_names analog)."""
    etype = ENTITY_TYPES[idx % 4]
    k = idx // 4
    if etype == "ORG":
        a, b, c, extra = _mixed_radix(k, len(_ADJ), len(_NOUN), len(_ORG_SUF))
        name = f"{_ADJ[a]} {_NOUN[b]} {_ORG_SUF[c]}"
        if extra:
            name = f"{name} {extra + 1}"
        aliases = (name, f"{_ADJ[a]} {_NOUN[b]}", _acronym(name))
    elif etype == "PERSON":
        a, b, extra = _mixed_radix(k, len(_FIRST), len(_LAST))
        if extra:
            name = f"{_FIRST[a]} {chr(65 + (extra - 1) % 26)}. {_LAST[b]}"
        else:
            name = f"{_FIRST[a]} {_LAST[b]}"
        aliases = (name, f"{_FIRST[a][0]}. {_LAST[b]}")
    elif etype == "PLACE":
        a, b, c, extra = _mixed_radix(k, len(_PLACE_PRE), len(_PLACE_SUF), len(_PLACE_DIR))
        name = f"{_PLACE_DIR[c]}{_PLACE_PRE[a]}{_PLACE_SUF[b]}"
        if extra:
            name = f"{name} {extra + 1}"
        aliases = (name, f"{name} City")
    else:  # PRODUCT
        a, b, extra = _mixed_radix(k, len(_PROD_A), len(_PROD_B))
        name = f"{_PROD_A[a]}{_PROD_B[b]}"
        if extra:
            name = f"{name} {extra + 1}"
        aliases = (name, f"{name} Pro")
    return Entity(idx, etype, name, aliases)


def n_entities_for(n_pages: int) -> int:
    """Entity vocabulary grows with the corpus but saturates (as a real
    web entity vocabulary does) — keeps the broadcast gazetteer bounded
    at any corpus scale."""
    return max(40, min(n_pages // 10, 20_000))


@lru_cache(maxsize=8)
def entity_universe(n_pages: int) -> tuple[Entity, ...]:
    return tuple(make_entity(i) for i in range(n_entities_for(n_pages)))


def _typo(rng: random.Random, s: str) -> str:
    """Swap two adjacent inner letters — an unknown surface only the
    MinHash/union-find canonicalization stage can merge back."""
    if len(s) < 5:
        return s
    i = rng.randrange(1, len(s) - 2)
    return s[:i] + s[i + 1] + s[i] + s[i + 2 :]


def _pick_relations(rng: random.Random, ents: tuple[Entity, ...], topic: Entity):
    """Choose 2–5 (subj, pred, obj) relations for one page."""
    rels = []
    n_rel = rng.randint(2, 5)
    for _ in range(n_rel):
        subj = topic if (rng.random() < 0.5 and _PREDS_BY_SUBJ.get(topic.etype)) else None
        if subj is None:
            subj = ents[rng.randrange(len(ents))]
            if subj.etype not in _PREDS_BY_SUBJ:
                continue
        pred, _st, obj_t, phrase = rng.choice(_PREDS_BY_SUBJ[subj.etype])
        # deterministic scan for an object of the right type
        start = rng.randrange(len(ents))
        obj = None
        for off in range(len(ents)):
            cand = ents[(start + off) % len(ents)]
            if cand.etype == obj_t and cand.idx != subj.idx:
                obj = cand
                break
        if obj is None:
            continue
        rels.append((subj, pred, phrase, obj))
    return rels


def _page_body(rng: random.Random, ents: tuple[Entity, ...], topic: Entity, rels) -> tuple[list[str], list[str]]:
    """Return (paragraphs, sentences) — each paragraph a list of sentences
    joined later; sentences returned flat for ground-truth bookkeeping."""
    sents: list[str] = []
    for subj, _pred, phrase, obj in rels:
        s_surface = rng.choice(subj.aliases)
        o_surface = rng.choice(obj.aliases)
        if rng.random() < TYPO_PROB:
            s_surface = _typo(rng, s_surface)
        if rng.random() < TYPO_PROB:
            o_surface = _typo(rng, o_surface)
        sents.append(f"{s_surface} {phrase} {o_surface}.")
    n_distr = rng.randint(1, 3)
    for _ in range(n_distr):
        e = ents[rng.randrange(len(ents))]
        sents.append(rng.choice(_DISTRACTORS).format(e=rng.choice(e.aliases)))
    for _ in range(rng.randint(1, 2)):
        sents.append(rng.choice(_FILLER))
    rng.shuffle(sents)
    # group into paragraphs of 2-3 sentences
    paras: list[str] = []
    i = 0
    while i < len(sents):
        n = min(rng.randint(2, 3), len(sents) - i)
        paras.append(" ".join(sents[i : i + n]))
        i += n
    return paras, sents


def _render_html(title: str, paras: list[str]) -> bytes:
    nav = '<nav><a href="/">Home</a> <a href="/world">World</a> <a href="/biz">Business</a></nav>'
    body = "".join(f"<p>{p}</p>" for p in paras)
    doc = (
        "<html><head>"
        f"<title>{title}</title>"
        "<style>body { font: 14px sans-serif; } .x{color:red}</style>"
        '<script>var t = "<p>not text</p>"; track(t);</script>'
        "</head><body>"
        f"{nav}<h1>{title}</h1>{body}"
        "<!-- boilerplate comment -->"
        "<footer>&copy; 2025 Example Media &mdash; all rights reserved</footer>"
        "</body></html>"
    )
    return doc.encode("utf-8")


def page_url(i: int) -> str:
    return f"https://{_DOMAINS[i % len(_DOMAINS)]}/article/{i:08d}"


def gen_page_rows(i: int, n_pages: int, seed: int = CORPUS_SEED, max_html_bytes: int = 800_000) -> list[dict]:
    """All physical rows for logical page ``i`` — 1 row normally, 2 when a
    stale duplicate crawl exists. Pure function of (i, n_pages, seed)."""
    ents = entity_universe(n_pages)
    rng = random.Random(f"blarify-ray:{seed}:page:{i}")
    hot = rng.random() < HOT_ENTITY_PROB
    topic = ents[0] if hot else ents[rng.randrange(len(ents))]
    rels = _pick_relations(rng, ents, topic)
    paras, _sents = _page_body(rng, ents, topic, rels)
    title = f"{topic.name} in focus"
    html = _render_html(title, paras)
    lang = "de" if i % RAW_LANG_MOD == 5 else "en"

    if i % EMPTY_HTML_MOD == 7:
        html = b""
    elif i % BROKEN_UTF8_MOD == 13:
        html = html[: len(html) // 2] + b"\xff\xfe\xfa" + html[len(html) // 2 :]
    elif i % OVERSIZE_MOD == 11:
        html = html + b"<!--" + b"x" * (max_html_bytes + 1) + b"-->"

    url = page_url(i)
    ts = BASE_TS_US + i * 1_000_000
    rows = [{"url": url, "warc_ts": ts, "html": html, "text": "", "lang": lang}]
    if i % DUP_URL_MOD == 0:
        # stale earlier crawl with different content — must lose the
        # latest-crawl-wins dedup and never contribute triples
        rng2 = random.Random(f"blarify-ray:{seed}:stale:{i}")
        topic2 = ents[rng2.randrange(len(ents))]
        rels2 = _pick_relations(rng2, ents, topic2)
        paras2, _ = _page_body(rng2, ents, topic2, rels2)
        rows.append(
            {
                "url": url,
                "warc_ts": ts - 86_400_000_000,
                "html": _render_html(f"{topic2.name} earlier coverage", paras2),
                "text": "",
                "lang": lang,
            }
        )
    return rows


def expected_triples(i: int, n_pages: int, seed: int = CORPUS_SEED) -> list[tuple[str, str, str]]:
    """Ground-truth (subj_canonical, pred, obj_canonical) for logical page
    ``i`` — what a perfect pipeline should emit for the LATEST crawl.
    Empty for dirty/raw pages."""
    if i % EMPTY_HTML_MOD == 7 or i % OVERSIZE_MOD == 11 or i % RAW_LANG_MOD == 5:
        return []
    ents = entity_universe(n_pages)
    rng = random.Random(f"blarify-ray:{seed}:page:{i}")
    hot = rng.random() < HOT_ENTITY_PROB
    topic = ents[0] if hot else ents[rng.randrange(len(ents))]
    rels = _pick_relations(rng, ents, topic)
    # broken-utf8 pages lose some content mid-page; triples crossing the
    # damage may drop — excluded from exact ground-truth comparison.
    return [(s.name, p, o.name) for (s, p, _ph, o) in rels]
