"""Property-based kernel tests (hypothesis)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from nise_ray.hashing import (
    U64,
    hamming64,
    minhash_seeds,
    minhash_signatures,
    oph_signatures,
    poly_fold,
    rolling_poly_hash,
    splitmix64,
)
from nise_ray.ops.normalize import normalize_text


@given(st.lists(st.integers(0, 2**64 - 1), min_size=1, max_size=200,
                unique=True))
def test_splitmix64_injective_on_sample(xs):
    arr = np.array(xs, dtype=U64)
    assert len(np.unique(splitmix64(arr))) == len(xs)


@given(st.binary(min_size=64, max_size=4000))
@settings(max_examples=30)
def test_rolling_hash_equals_windowed_fold(data):
    a = np.frombuffer(data, dtype=np.uint8)
    windows = np.lib.stride_tricks.sliding_window_view(a, 64).astype(U64)
    assert np.array_equal(rolling_poly_hash(a, 64), poly_fold(windows))


@given(st.text(max_size=500))
@settings(max_examples=50)
def test_normalize_idempotent(s):
    once = normalize_text(s)
    assert normalize_text(once) == once


@given(st.integers(0, 2**64 - 1), st.integers(0, 2**64 - 1))
def test_hamming_symmetric_triangle(a, b):
    a_, b_ = np.uint64(a), np.uint64(b)
    assert hamming64(a_, b_) == hamming64(b_, a_)
    assert hamming64(a_, a_) == 0


@given(st.integers(0, 2**32), st.floats(0.3, 0.99))
@settings(max_examples=10, deadline=None)
def test_oph_and_kperm_agree_on_estimates(seed, overlap):
    """Both MinHash modes must estimate Jaccard within sampling error."""
    rng = np.random.Generator(np.random.PCG64(seed))
    n = 800
    shared = rng.integers(0, 2**63, int(n * overlap), dtype=np.uint64)
    a = np.unique(np.concatenate(
        [shared, rng.integers(0, 2**63, n - len(shared), dtype=np.uint64)]))
    b = np.unique(np.concatenate(
        [shared, rng.integers(0, 2**63, n - len(shared), dtype=np.uint64)]))
    true_j = len(np.intersect1d(a, b)) / len(np.union1d(a, b))
    sh = np.concatenate([a, b])
    offs = np.array([0, len(a), len(a) + len(b)])
    seeds = minhash_seeds(128, 42)
    kp = minhash_signatures(sh, offs, seeds)
    op = oph_signatures(sh, offs, 128, int(seeds[0]))
    est_kp = (kp[0] == kp[1]).mean()
    est_op = (op[0] == op[1]).mean()
    # K=128 -> std ~ sqrt(J(1-J)/128) <= 0.045; allow 4 sigma
    assert abs(est_kp - true_j) < 0.2
    assert abs(est_op - true_j) < 0.2


@given(st.lists(st.integers(0, 2**63), min_size=0, max_size=50),
       st.lists(st.integers(0, 2**63), min_size=0, max_size=50))
@settings(max_examples=30)
def test_oph_deterministic_and_order_insensitive(xs, ys):
    """Signatures depend on the SET of shingles, not their order."""
    a = np.unique(np.array(xs + ys, dtype=U64))
    if len(a) == 0:
        return
    perm = np.random.default_rng(0).permutation(len(a))
    offs = np.array([0, len(a)])
    s1 = oph_signatures(a, offs, 128, 12345)
    s2 = oph_signatures(a[perm], offs, 128, 12345)
    assert np.array_equal(s1, s2)
