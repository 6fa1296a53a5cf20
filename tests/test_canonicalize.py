"""Canonicalization: serial spec behavior + distributed == serial."""

import ray

from blarify_ray.canonical import canonicalize_surfaces, verified_pairs
from blarify_ray.config import DEFAULT_CONFIG
from blarify_ray.stages.canonicalize import build_canonical_map

KNOWN = {
    "global data systems": ("Global Data Systems", "ORG"),
    "solar data systems": ("Solar Data Systems", "ORG"),
    "nordic foods": ("Nordic Foods Industries", "ORG"),
    "hiro almeida": ("Hiro Almeida", "PERSON"),
}


def test_typo_attaches_to_best_known():
    canon = canonicalize_surfaces({"nrodic foods"}, KNOWN, DEFAULT_CONFIG)
    assert canon["nrodic foods"] == ("Nordic Foods Industries", "ORG", False)


def test_knowns_never_pair_with_each_other():
    pairs = verified_pairs(set(), set(KNOWN), DEFAULT_CONFIG)
    assert pairs == []  # no unk side → nothing emitted


def test_unrelated_surface_becomes_new_entity():
    canon = canonicalize_surfaces({"zzz qqq vvv"}, KNOWN, DEFAULT_CONFIG)
    assert canon["zzz qqq vvv"] == ("zzz qqq vvv", "UNK", True)


def test_unk_cluster_merges_and_shares_attachment():
    # two typo variants of the same known name cluster together and both
    # resolve to it
    unks = {"golbal data systems", "global data sytsems"}
    canon = canonicalize_surfaces(unks, KNOWN, DEFAULT_CONFIG)
    for u in unks:
        assert canon[u][0] == "Global Data Systems"


def test_embedding_resolver_mode():
    """ResolverMode.EMBEDDING scores pairs by cosine over feature-hashed
    shingle embeddings — a typo'd surface must still attach to its known
    entity, and serial == distributed under the mode."""
    import dataclasses

    import pyarrow as pa
    import ray.data as rd

    from blarify_ray.config import ResolverMode
    from blarify_ray.stages.canonicalize import build_canonical_map

    cfg = dataclasses.replace(
        DEFAULT_CONFIG, resolver_mode=ResolverMode.EMBEDDING, canon_driver_max_norms=0
    )
    unks = {"nrodic foods", "golbal data systems", "zzz qqq vvv"}
    want = canonicalize_surfaces(unks, KNOWN, cfg)
    assert want["nrodic foods"] == ("Nordic Foods Industries", "ORG", False)
    assert want["zzz qqq vvv"][2] is True  # unrelated stays new

    tbl = pa.table({"key": sorted(unks), "resolved": [False] * len(unks)})
    got_tbl = build_canonical_map(rd.from_arrow(tbl), KNOWN, cfg)
    got = {
        n: (nm, t, bool(new))
        for n, nm, t, new in zip(
            got_tbl["norm"].to_pylist(), got_tbl["name"].to_pylist(),
            got_tbl["etype"].to_pylist(), got_tbl["is_new"].to_pylist(),
        )
    }
    assert got == want


def test_distributed_cc_loop():
    """Exercise the distributed min-label-propagation path directly (the
    driver fallback handles small pair sets in build_canonical_map)."""
    import pyarrow as pa
    import ray.data as rd

    from blarify_ray.stages.canonicalize import connected_components

    pairs = rd.from_arrow(
        pa.table(
            {
                "x": ["b", "c", "e", "z"],
                "y": ["a", "b", "f", "y"],
            }
        )
    )
    comp = connected_components(pairs, DEFAULT_CONFIG)
    assert comp == {"a": "a", "b": "a", "c": "a", "e": "e", "f": "e", "y": "y", "z": "y"}


def test_distributed_matches_serial_spec():
    """Both execution tiers of build_canonical_map must reproduce the
    serial spec: the driver fast-path (default config) AND the fully
    distributed LSH/verify/cluster path (threshold forced to 0)."""
    import dataclasses

    import pyarrow as pa
    import ray.data as rd

    unks = {
        "nrodic foods",
        "golbal data systems",
        "global data sytsems",
        "zzz qqq vvv",
        "hiro almedia",
    }
    want = canonicalize_surfaces(unks, KNOWN, DEFAULT_CONFIG)

    # fabricate a minimal mentions_resolved dataset carrying the unks
    tbl = pa.table(
        {
            "key": list(unks) + ["Global Data Systems"],
            "resolved": [False] * len(unks) + [True],
        }
    )
    forced_distributed = dataclasses.replace(DEFAULT_CONFIG, canon_driver_max_norms=0)
    for cfg in (DEFAULT_CONFIG, forced_distributed):
        got_tbl = build_canonical_map(rd.from_arrow(tbl), KNOWN, cfg)
        got = {
            n: (nm, t, bool(new))
            for n, nm, t, new in zip(
                got_tbl["norm"].to_pylist(),
                got_tbl["name"].to_pylist(),
                got_tbl["etype"].to_pylist(),
                got_tbl["is_new"].to_pylist(),
            )
        }
        assert got == want


def test_distributed_cc_long_chain_int64():
    """connected_components_ds over int64 node ids on a diameter-200 path
    graph: pointer jumping must converge well inside the 64-round cap and
    label every node with the path minimum."""
    import pyarrow as pa
    import ray.data as rd

    from blarify_ray.stages.canonicalize import connected_components_ds

    n = 200
    pairs = rd.from_arrow(
        pa.table({"x": list(range(1, n)), "y": list(range(0, n - 1))})
    )
    rows = connected_components_ds(pairs, DEFAULT_CONFIG).take_all()
    assert len(rows) == n
    assert all(r["comp"] == 0 for r in rows)


def test_forced_distributed_cc_tier_matches_serial():
    """build_canonical_map with BOTH the driver fast-path and the driver
    pair-assembly disabled (canon_driver_max_norms=0, cc_driver_max_pairs=0)
    routes unk–unk clustering through connected_components_ds — output
    must still equal the serial spec exactly."""
    import dataclasses

    import pyarrow as pa
    import ray.data as rd

    unks = {
        "nrodic foods",
        "golbal data systems",
        "global data sytsems",
        "zzz qqq vvv",
        "zzz qqq vvw",  # near-dup of the new entity → unk–unk cluster
        "hiro almedia",
    }
    want = canonicalize_surfaces(unks, KNOWN, DEFAULT_CONFIG)
    tbl = pa.table(
        {
            "key": list(unks) + ["Global Data Systems"],
            "resolved": [False] * len(unks) + [True],
        }
    )
    cfg = dataclasses.replace(
        DEFAULT_CONFIG, canon_driver_max_norms=0, cc_driver_max_pairs=0
    )
    got_tbl = build_canonical_map(rd.from_arrow(tbl), KNOWN, cfg)
    got = {
        n: (nm, t, bool(new))
        for n, nm, t, new in zip(
            got_tbl["norm"].to_pylist(), got_tbl["name"].to_pylist(),
            got_tbl["etype"].to_pylist(), got_tbl["is_new"].to_pylist(),
        )
    }
    assert got == want


def test_auto_mode_fallback_chain():
    """ResolverMode.AUTO (HybridResolver analog): the dictionary
    (Jaccard) scorer decides first; surfaces it cannot attach fall back
    to the embedding scorer per pair. With the Jaccard threshold forced
    sky-high the dictionary rejects everything — JACCARD mode then mints
    a new entity for the typo while AUTO still rescues it via cosine."""
    import dataclasses

    from blarify_ray.config import ResolverMode

    strict_jac = dataclasses.replace(
        DEFAULT_CONFIG, resolver_mode=ResolverMode.JACCARD, jaccard_threshold=0.99
    )
    strict_auto = dataclasses.replace(
        DEFAULT_CONFIG, resolver_mode=ResolverMode.AUTO, jaccard_threshold=0.99
    )
    unks = {"nrodic foods", "zzz qqq vvv"}
    jac = canonicalize_surfaces(unks, KNOWN, strict_jac)
    auto = canonicalize_surfaces(unks, KNOWN, strict_auto)
    assert jac["nrodic foods"][2] is True  # dictionary alone: new entity
    assert auto["nrodic foods"] == ("Nordic Foods Industries", "ORG", False)
    assert auto["zzz qqq vvv"][2] is True  # unrelated stays new in AUTO too

    # at DEFAULT thresholds a dictionary hit must outrank any cosine:
    # the pair score of an accepted dict pair is 1+j > 1 >= cosine
    from blarify_ray.canonical import pair_scorer

    auto_cfg = dataclasses.replace(DEFAULT_CONFIG, resolver_mode=ResolverMode.AUTO)
    keys = sorted({"nrodic foods"} | set(KNOWN))
    score, thr = pair_scorer(keys, auto_cfg)
    s = score("nrodic foods", "nordic foods")
    assert s > 1.0  # dictionary-accepted encoding
    assert thr == auto_cfg.embed_link_threshold


def test_auto_mode_serial_equals_distributed():
    """AUTO mode parity across all three execution tiers: serial spec ==
    driver fast-path == fully distributed (norms gate 0) == dataset
    assembly (norms AND pairs gates 0)."""
    import dataclasses

    import pyarrow as pa
    import ray.data as rd

    from blarify_ray.config import ResolverMode

    unks = {
        "nrodic foods",
        "golbal data systems",
        "global data sytsems",
        "zzz qqq vvv",
        "zzz qqq vvw",
        "hiro almedia",
    }
    base = dataclasses.replace(
        DEFAULT_CONFIG, resolver_mode=ResolverMode.AUTO, jaccard_threshold=0.99
    )
    want = canonicalize_surfaces(unks, KNOWN, base)
    # the strict dictionary forces the embedding fallback to do the work
    assert want["nrodic foods"][2] is False

    tbl = pa.table(
        {
            "key": list(unks) + ["Global Data Systems"],
            "resolved": [False] * len(unks) + [True],
        }
    )
    for cfg in (
        base,
        dataclasses.replace(base, canon_driver_max_norms=0),
        dataclasses.replace(base, canon_driver_max_norms=0, cc_driver_max_pairs=0),
    ):
        got_tbl = build_canonical_map(rd.from_arrow(tbl), KNOWN, cfg)
        got = {
            n: (nm, t, bool(new))
            for n, nm, t, new in zip(
                got_tbl["norm"].to_pylist(), got_tbl["name"].to_pylist(),
                got_tbl["etype"].to_pylist(), got_tbl["is_new"].to_pylist(),
            )
        }
        assert got == want
