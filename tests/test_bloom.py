"""Bloom semi-/anti-join: exactness against pandas isin (the primitive
must be EXACT despite the probabilistic prefilter), measured
false-positive rate of the filter itself, and the prefilter actually
cutting the exchange on a selective join."""

import numpy as np
import pandas as pd
import pytest
import ray.data

from blarify_ray.ops.bloom import (
    bloom_semi_join,
    build_bloom,
    might_contain,
)

N_BITS = 1 << 16  # small filter → measurable FP rate
K = 6


def _ds(df: pd.DataFrame) -> ray.data.Dataset:
    return ray.data.from_pandas(df).repartition(4)


@pytest.mark.parametrize("anti", [False, True])
@pytest.mark.parametrize("dtype", ["int", "str"])
def test_bloom_join_exact(ray_session, anti, dtype):
    rng = np.random.RandomState(5)
    lk = rng.randint(0, 5000, size=3000)
    rk = rng.randint(2500, 7500, size=1200)
    if dtype == "str":
        lk = np.array([f"k{v}" for v in lk], dtype=object)
        rk = np.array([f"k{v}" for v in rk], dtype=object)
    left = pd.DataFrame({"key": lk, "payload": np.arange(len(lk))})
    right = pd.DataFrame({"key": rk})

    got = bloom_semi_join(
        _ds(left), _ds(right), "key", "key", anti=anti,
        n_bits=N_BITS, k=K, partitions=8,
    ).to_pandas()
    member = left["key"].isin(set(rk))
    want = left[~member] if anti else left[member]
    a = got.sort_values(["payload"]).reset_index(drop=True)
    b = want.sort_values(["payload"]).reset_index(drop=True)
    assert a["payload"].tolist() == b["payload"].tolist()
    assert a["key"].astype(str).tolist() == b["key"].astype(str).tolist()


def test_bloom_no_false_negatives_and_fp_rate(ray_session):
    rng = np.random.RandomState(7)
    members = np.unique(rng.randint(0, 10**9, size=4000))
    blob = build_bloom(
        _ds(pd.DataFrame({"k": members})), "k", n_bits=N_BITS, k=K
    )
    # no false negatives, ever
    assert might_contain(blob, members, N_BITS, K).all()
    # FP rate near theory: (1 - e^(-kn/m))^k ≈ 0.56% at n=4000, m=65536
    probes = np.unique(rng.randint(10**9, 2 * 10**9, size=50_000))
    fp = might_contain(blob, probes, N_BITS, K).mean()
    assert fp < 0.05, fp


def test_bloom_prefilter_cuts_selective_join(ray_session):
    # disjoint key spaces: a selective semi-join should ship almost
    # nothing to the exchange — verify via the filter mask directly
    left_keys = np.arange(0, 100_000, dtype=np.int64)
    right_keys = np.arange(10**7, 10**7 + 2000, dtype=np.int64)
    blob = build_bloom(
        _ds(pd.DataFrame({"k": right_keys})), "k", n_bits=N_BITS, k=K
    )
    surviving = might_contain(blob, left_keys, N_BITS, K).mean()
    assert surviving < 0.05, surviving  # ≥95% of left never shuffles
    # and the join result is exactly empty / full
    left = pd.DataFrame({"key": left_keys[:5000], "payload": np.arange(5000)})
    semi = bloom_semi_join(
        _ds(left), _ds(pd.DataFrame({"key": right_keys})), "key", "key",
        n_bits=N_BITS, k=K, partitions=8,
    )
    assert semi.count() == 0
    anti = bloom_semi_join(
        _ds(left), _ds(pd.DataFrame({"key": right_keys})), "key", "key",
        anti=True, n_bits=N_BITS, k=K, partitions=8,
    )
    assert anti.count() == 5000


def test_bloom_blob_deterministic(ray_session):
    df = pd.DataFrame({"k": np.arange(1000, dtype=np.int64)})
    b1 = build_bloom(_ds(df), "k", n_bits=N_BITS, k=K)
    b2 = build_bloom(_ds(df).repartition(2), "k", n_bits=N_BITS, k=K)
    assert (b1 == b2).all()
