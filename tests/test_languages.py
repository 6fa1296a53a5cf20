"""Pluggable per-language extraction rules: a second registered language
(German) must route through its own connector table — and the serial and
Ray paths must stay exactly equal on a mixed-language corpus
(LanguageDefinitions extension point, language_definitions.py:21-109)."""

import dataclasses
import shutil

import pyarrow as pa
import ray.data as rd

from blarify_ray.config import DEFAULT_CONFIG
from blarify_ray.corpus import entity_universe
from blarify_ray.pipelines.kg_build import build_kg, triples_table
from blarify_ray.schemas import PAGES
from blarify_ray.serial import run_serial

N = 40  # entity universe size driver
OUT = "/tmp/blarify_ray_test_langs"
BASE_TS = 1_735_689_600_000_000


def _mixed_rows():
    ents = entity_universe(N)
    org = next(e for e in ents if e.etype == "ORG")
    person = next(e for e in ents if e.etype == "PERSON")
    place = next(e for e in ents if e.etype == "PLACE")
    rows = []

    def page(i, text, lang):
        rows.append(
            {
                "url": f"https://test.example.org/{lang}/{i:04d}",
                "warc_ts": BASE_TS + i * 1_000_000,
                "html": b"",
                "text": text,
                "lang": lang,
            }
        )

    page(0, f"{org.name} wurde gegründet von {person.name}. "
            f"{org.name} hat ihren Sitz in {place.name}.", "de")
    page(1, f"{org.name} was founded by {person.name}. "
            f"{person.name} works for {org.name}.", "en")
    # the ENGLISH connector inside a German page must NOT fire (wrong
    # language table), and vice versa
    page(2, f"{org.name} was founded by {person.name}.", "de")
    page(3, f"{org.name} wurde gegründet von {person.name}.", "en")
    # unregistered language → RAW passthrough
    page(4, f"{org.name} wurde gegründet von {person.name}.", "fr")
    return rows, org, person, place


def test_mixed_language_serial_equals_ray():
    cfg = dataclasses.replace(DEFAULT_CONFIG, supported_langs=("en", "de"))
    rows, org, person, place = _mixed_rows()
    serial = run_serial(rows, N, cfg)

    shutil.rmtree(OUT, ignore_errors=True)
    pages = rd.from_arrow(pa.Table.from_pylist(rows, schema=PAGES))
    paths = build_kg(OUT, N, cfg, pages=pages, source_fingerprint="langs-test")

    got = {
        (r["url"], r["sent_id"], r["subj"], r["pred"], r["obj"])
        for r in triples_table(paths, cfg).take_all()
    }
    want = {
        (t["url"], t["sent_id"], t["subj"], t["pred"], t["obj"])
        for t in serial["triples"]
    }
    assert got == want

    # the German page produced German-rule triples…
    de_preds = {(t["pred"]) for t in serial["triples"] if "/de/" in t["url"]}
    assert {"FOUNDED_BY", "LOCATED_IN"} <= de_preds
    # …the English connector did NOT fire on a German page and vice versa
    assert not any(
        t["url"].endswith("/de/0002") or t["url"].endswith("/en/0003")
        for t in serial["triples"]
    )
    # unregistered lang stays RAW on both paths
    raw_urls_serial = {d["url"] for d in serial["docs"] if d["raw"]}
    from blarify_ray.state.manifest import read_stage

    raw_urls_ray = {
        r["url"]
        for r in read_stage(paths["docs"], columns=["url", "raw"]).take_all()
        if r["raw"]
    }
    assert raw_urls_serial == raw_urls_ray
    # fr IS registered, but not in this run's supported_langs → RAW
    assert any(u.endswith("/fr/0004") for u in raw_urls_serial)


def test_registry_phrases_can_fire():
    """No connector phrase may contain a token the proper-noun mention
    detector would capture (it would break the adjacent-pair rule and
    the phrase could never fire), and every language covers FOUNDED_BY."""
    from blarify_ray.langs import REGISTRY
    from blarify_ray.rules import _RE_PROPER

    for lang, defs in REGISTRY.items():
        assert "FOUNDED_BY" in set(defs.connector_to_pred.values()), lang
        for phrase in defs.connector_to_pred:
            assert not _RE_PROPER.search(phrase), (lang, phrase)


def test_wide_registry_serial_equals_ray():
    """Every registered language routes through its own connector table:
    one page per language, each with that language's FOUNDED_BY phrase —
    serial == Ray, and each page yields exactly its own-language triple."""
    from blarify_ray.langs import REGISTRY

    langs = sorted(REGISTRY)
    assert len(langs) >= 7  # EN, DE, FR, ES, IT, PT, NL
    cfg = dataclasses.replace(DEFAULT_CONFIG, supported_langs=tuple(langs))
    ents = entity_universe(N)
    org = next(e for e in ents if e.etype == "ORG")
    person = next(e for e in ents if e.etype == "PERSON")

    rows = []
    for i, lang in enumerate(langs):
        phrase = next(
            p for p, pred in REGISTRY[lang].connector_to_pred.items()
            if pred == "FOUNDED_BY"
        )
        rows.append(
            {
                "url": f"https://wide.example.org/{lang}/{i:04d}",
                "warc_ts": BASE_TS + i * 1_000_000,
                "html": b"",
                "text": f"{org.name} {phrase} {person.name}.",
                "lang": lang,
            }
        )
    serial = run_serial(rows, N, cfg)

    out = OUT + "_wide"
    shutil.rmtree(out, ignore_errors=True)
    pages = rd.from_arrow(pa.Table.from_pylist(rows, schema=PAGES))
    paths = build_kg(out, N, cfg, pages=pages, source_fingerprint="langs-wide")

    got = {
        (r["url"], r["sent_id"], r["subj"], r["pred"], r["obj"])
        for r in triples_table(paths, cfg).take_all()
    }
    want = {
        (t["url"], t["sent_id"], t["subj"], t["pred"], t["obj"])
        for t in serial["triples"]
    }
    assert got == want
    # every language produced its FOUNDED_BY triple from its own phrase
    founded_urls = {t["url"] for t in serial["triples"] if t["pred"] == "FOUNDED_BY"}
    assert {f"https://wide.example.org/{lang}" for lang in langs} == {
        u.rsplit("/", 1)[0] for u in founded_urls
    }
