"""Serial single-process reference implementation — produces the golden
fixtures the Ray pipeline is compared against (FIXTURES.md §3; mirrors
how blarify's tests assert structure from known example corpora,
``tests/integration/test_graphbuilder_basic.py:64-73``).

Plain Python loops over row dicts; shares ONLY the pure per-record
functions (text.py, rules.py, linking.py, canonical.py) with the Ray
path — batching, shuffling and parallelism are exercised solely on the
Ray side, which must reproduce these outputs exactly (determinism under
parallelism, SURVEY.md §7.4).
"""

from __future__ import annotations

from collections import defaultdict

from .canonical import canonicalize_surfaces
from .config import DEFAULT_CONFIG, PipelineConfig
from .corpus import entity_universe
from .ids import entity_id
from .langs import for_lang
from .linking import known_alias_norms, resolve_mention_keys
from .rules import Gazetteer, extract_triples_from_sentence
from .text import html_to_text, scope_snippet, split_sentences, text_sha256


def run_serial(rows: list[dict], n_pages: int, cfg: PipelineConfig = DEFAULT_CONFIG) -> dict:
    """pages rows → {docs, mentions, triples, entities, edges} as plain
    list-of-dict tables with deterministic ordering."""
    gaz = Gazetteer(entity_universe(n_pages))

    # S1a: latest-crawl-wins dedup per url (ties impossible: ts strictly set)
    latest: dict[str, dict] = {}
    for r in rows:
        cur = latest.get(r["url"])
        if cur is None or r["warc_ts"] > cur["warc_ts"]:
            latest[r["url"]] = r

    docs, mentions, triples_linked = [], [], []
    unk_norms: set[str] = set()
    dropped_oversize = 0

    for url in sorted(latest):
        r = latest[url]
        if len(r["html"]) > cfg.max_html_bytes:
            dropped_oversize += 1
            continue
        text = r["text"] or html_to_text(r["html"])
        defs = for_lang(r["lang"])
        raw = r["lang"] not in cfg.supported_langs or defs is None
        sents = [] if raw else split_sentences(text)
        docs.append(
            {
                "url": url,
                "warc_ts": r["warc_ts"],
                "lang": r["lang"],
                "text": text,
                "text_sha": text_sha256(text),
                "raw": raw,
                "n_sents": len(sents),
            }
        )
        if raw or not text:
            continue

        page_mentions = []  # (sent_id, Mention)
        per_sent = []
        for sid, sent in enumerate(sents):
            ms = gaz.find_mentions(sent, defs)
            per_sent.append((sid, sent, ms))
            page_mentions.extend(ms)
        keys = resolve_mention_keys(gaz, page_mentions)
        key_by_span = {}
        ki = 0
        for sid, sent, ms in per_sent:
            for m in ms:
                mentions.append(
                    {
                        "url": url,
                        "sent_id": sid,
                        "start": m.start,
                        "end": m.end,
                        "surface": m.surface,
                        "ner_type": m.ner_type,
                    }
                )
                key_by_span[(sid, m.start)] = keys[ki]
                if not keys[ki][2]:
                    unk_norms.add(keys[ki][0])
                ki += 1
        for sid, sent, ms in per_sent:
            for a, pred, b in extract_triples_from_sentence(sent, ms, defs):
                sk, st, sres = key_by_span[(sid, a.start)]
                ok, ot, ores = key_by_span[(sid, b.start)]
                triples_linked.append(
                    {
                        "url": url,
                        "sent_id": sid,
                        "subj_key": sk,
                        "subj_type": st,
                        "subj_resolved": sres,
                        "pred": pred,
                        "obj_key": ok,
                        "obj_type": ot,
                        "obj_resolved": ores,
                        "sent_text": scope_snippet(sent),
                    }
                )

    # S5: canonicalize unknown surfaces against all UNAMBIGUOUS alias norms
    # (ambiguous acronyms excluded — a typo'd acronym must not attach to an
    # arbitrary candidate)
    known = known_alias_norms(gaz)
    canon = canonicalize_surfaces(unk_norms, known, cfg)

    def resolve(key: str, typ: str, resolved: bool) -> tuple[str, str]:
        if resolved:
            return key, typ
        name, etype, _new = canon[key]
        return name, etype

    # final triples with canonical names
    triples = []
    for t in triples_linked:
        sname, stype = resolve(t["subj_key"], t["subj_type"], t["subj_resolved"])
        oname, otype = resolve(t["obj_key"], t["obj_type"], t["obj_resolved"])
        triples.append(
            {
                "url": t["url"],
                "sent_id": t["sent_id"],
                "subj": sname,
                "subj_type": stype,
                "pred": t["pred"],
                "obj": oname,
                "obj_type": otype,
                "sent_text": t["sent_text"],
            }
        )

    # S6: entities (only those actually mentioned) + edges
    ent_mentions: dict[tuple[str, str], int] = defaultdict(int)
    ent_aliases: dict[tuple[str, str], set[str]] = defaultdict(set)
    # Re-walk mentions with their resolution to aggregate aliases/counts;
    # serial keeps it simple and recomputes resolution per page.
    by_url: dict[str, list[dict]] = defaultdict(list)
    for m in mentions:
        by_url[m["url"]].append(m)
    from .rules import Mention as _M

    for url, ms in by_url.items():
        mobjs = [_M(m["start"], m["end"], m["surface"], m["ner_type"]) for m in ms]
        keys = resolve_mention_keys(gaz, mobjs)
        for m, (k, t, res) in zip(ms, keys):
            name, etype = resolve(k, t, res)
            ent_mentions[(name, etype)] += 1
            ent_aliases[(name, etype)].add(m["surface"])

    entities = []
    for (name, etype), n in sorted(ent_mentions.items()):
        entities.append(
            {
                "entity_id": entity_id(cfg.env, etype, name),
                "name": name,
                "type": etype,
                "aliases": sorted(ent_aliases[(name, etype)]),
                "n_mentions": n,
            }
        )

    eid = {(e["name"], e["type"]): e["entity_id"] for e in entities}
    edge_agg: dict[tuple[str, str, str], dict] = {}
    for t in sorted(triples, key=lambda t: (t["url"], t["sent_id"])):
        k = (t["subj"], t["pred"], t["obj"])
        cur = edge_agg.get(k)
        if cur is None:
            edge_agg[k] = {
                "src_id": eid[(t["subj"], t["subj_type"])],
                "dst_id": eid[(t["obj"], t["obj_type"])],
                "pred": t["pred"],
                # evidence snippet of the FIRST (url, sent_id) occurrence
                "scope_text": t["sent_text"],
                "url": t["url"],
                "sent_id": t["sent_id"],
                "weight": 1,
            }
        else:
            cur["weight"] += 1
    edges = [edge_agg[k] for k in sorted(edge_agg)]

    return {
        "docs": docs,
        "mentions": mentions,
        "triples": triples,
        "entities": entities,
        "edges": edges,
        "metrics": {"dropped_oversize": dropped_oversize, "n_pages_in": len(rows), "n_docs": len(docs)},
    }
