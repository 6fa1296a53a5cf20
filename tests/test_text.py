"""Pure-function tests: extraction determinism, dirty inputs, splitting."""

from blarify_ray.text import (
    bpeish_tokens,
    char_shingles,
    html_to_text,
    jaccard,
    normalize_surface,
    split_sentences,
    ws_tokens,
)


def test_html_to_text_strips_markup():
    html = (
        b"<html><head><title>T</title><style>.x{a:b}</style>"
        b'<script>var s = "<p>no</p>";</script></head>'
        b"<body><h1>Head</h1><p>One two.</p><p>Three &amp; four.</p>"
        b"<!-- hidden --><footer>&copy; 2025</footer></body></html>"
    )
    text = html_to_text(html)
    assert "no" not in text.split()  # script content gone
    assert "a:b" not in text
    assert "hidden" not in text
    assert "Three & four." in text
    assert "© 2025" in text
    assert text == html_to_text(html)  # deterministic


def test_html_to_text_broken_utf8_and_empty():
    assert html_to_text(b"") == ""
    good = html_to_text(b"<p>hello world</p>")
    broken = html_to_text(b"<p>hello \xff\xfe\xfaworld</p>")
    assert good == "hello world"
    assert broken == "hello world"  # invalid bytes ignored (reference policy)


def test_split_sentences_keeps_initials_and_acronyms():
    sents = split_sentences("A. Almeida works for GDS. Markets were quiet.")
    # "A." must not split; "GDS." (capital before period) keeps following
    # text attached (documented abbreviation heuristic)
    assert sents[0].startswith("A. Almeida")
    text = "One sentence. Two sentence! Three?"
    assert split_sentences(text) == ["One sentence.", "Two sentence!", "Three?"]
    assert split_sentences("line one\nline two") == ["line one", "line two"]


def test_normalize_and_shingles():
    assert normalize_surface("  Global  Data-Systems! ") == "global data systems"
    a = char_shingles("global data", 3)
    b = char_shingles("global data", 3)
    assert a == b and jaccard(a, b) == 1.0
    assert jaccard(set(), set()) == 1.0
    assert 0 < jaccard(char_shingles("nordic foods", 3), char_shingles("nrodic foods", 3)) < 1


def test_tokenizers():
    assert ws_tokens("  a b\tc \n") == ["a", "b", "c"]
    assert ws_tokens("") == []
    assert bpeish_tokens("It's 42%!") == ["It", "'", "s", "42", "%", "!"]
