"""The serial reference itself must hit P/R ≥ 0.95 against the
by-construction ground truth (FIXTURES.md §3 gate)."""

from blarify_ray.corpus import expected_triples, gen_page_rows
from blarify_ray.serial import run_serial


def test_serial_pr_vs_ground_truth():
    N = 300
    rows = []
    for i in range(N):
        rows.extend(gen_page_rows(i, N))
    res = run_serial(rows, N)
    gt = set()
    for i in range(N):
        gt.update(expected_triples(i, N))
    got = {(t["subj"], t["pred"], t["obj"]) for t in res["triples"]}
    inter = gt & got
    p = len(inter) / max(1, len(got))
    r = len(inter) / max(1, len(gt))
    assert p >= 0.95, f"precision {p}"
    assert r >= 0.95, f"recall {r}"


def test_serial_dedup_and_drops():
    N = 120
    rows = []
    for i in range(N):
        rows.extend(gen_page_rows(i, N))
    res = run_serial(rows, N)
    urls = [d["url"] for d in res["docs"]]
    assert len(urls) == len(set(urls))  # latest-crawl dedup
    assert res["metrics"]["dropped_oversize"] >= 1
    # raw (unsupported-lang) docs present but produce no sentences
    raws = [d for d in res["docs"] if d["raw"]]
    assert raws and all(d["n_sents"] == 0 for d in raws)
