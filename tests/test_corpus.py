"""Corpus generator: determinism, entity uniqueness, dirty-row cadence."""

from blarify_ray.corpus import (
    DUP_URL_MOD,
    EMPTY_HTML_MOD,
    OVERSIZE_MOD,
    entity_universe,
    expected_triples,
    gen_page_rows,
)


def test_pages_deterministic():
    a = gen_page_rows(7, 200)
    b = gen_page_rows(7, 200)
    assert a == b
    assert a[0]["html"] == b[0]["html"]


def test_entity_names_unique():
    ents = entity_universe(5000)  # 500 entities
    names = [e.name for e in ents]
    assert len(set(names)) == len(names)
    assert all(e.name in e.aliases for e in ents)


def test_dirty_cadence():
    assert len(gen_page_rows(0, 200)) == 2  # 0 % DUP_URL_MOD == 0 → stale dup
    dup = gen_page_rows(DUP_URL_MOD, 200)
    assert len(dup) == 2 and dup[0]["url"] == dup[1]["url"]
    assert dup[0]["warc_ts"] > dup[1]["warc_ts"]
    assert gen_page_rows(EMPTY_HTML_MOD + 7, 200)[0]["html"] == b""
    over = gen_page_rows(OVERSIZE_MOD + 11, 200)[0]
    assert len(over["html"]) > 800_000
    assert expected_triples(OVERSIZE_MOD + 11, 200) == []  # dropped page → no truth


def test_expected_triples_nonempty_for_clean_pages():
    n = sum(1 for i in range(100) if expected_triples(i, 100))
    assert n > 80
