"""Tier-ratio placement (simd_hash_ratio analog, phj.cpp:101-116)."""

import numpy as np
import pytest

from hash_join_codes_knl_tpu.engine.oracle import join_oracle, multiset_digest
from hash_join_codes_knl_tpu.parallel.cpra import cpra_join
from hash_join_codes_knl_tpu.parallel.distributed import data_mesh
from hash_join_codes_knl_tpu.relgen.generate import generate
from hash_join_codes_knl_tpu.utils.hashing import np_hash_ratio


def test_np_hash_ratio_split_fractions():
    rng = np.random.default_rng(0)
    keys = rng.integers(1, 2**32, 200_000, dtype=np.uint32)
    for ratio in (0.25, 0.5, 0.8):
        pid = np_hash_ratio(keys, 0x9E3779B1, 8, ratio)
        frac_b = np.mean(pid >= 4)
        # the 100-bin cut quantizes the split to whole percent
        want = (100 - int((1.0 - ratio) * 100)) / 100
        assert abs(frac_b - want) < 0.01
        assert pid.min() >= 0 and pid.max() < 8


def test_tier_and_partition_hashes_independent():
    """The two levels must hash with independent factors (phj.cpp:101-123
    factors_1/factors_2): with both derived from one scramble, tier and
    pid are monotone in each other and half the mesh receives ZERO
    traffic.  Every chip must get a near-uniform share of its half."""
    rng = np.random.default_rng(5)
    keys = rng.integers(1, 2**32, 400_000, dtype=np.uint32)
    for ratio, want_b in ((0.5, 0.5), (0.75, 0.75)):
        pid = np_hash_ratio(keys, 0x9E3779B1, 8, ratio)
        frac = np.bincount(pid, minlength=8) / len(keys)
        want_a = (1 - want_b) / 4
        np.testing.assert_allclose(frac[:4], want_a, rtol=0.05)
        np.testing.assert_allclose(frac[4:], want_b / 4, rtol=0.05)


def test_device_tier_hash_matches_numpy_oracle():
    import jax.numpy as jnp

    from hash_join_codes_knl_tpu.utils.hashing import hash_ratio

    rng = np.random.default_rng(1)
    keys = rng.integers(1, 2**32, 8192, dtype=np.uint32)
    got = np.asarray(hash_ratio(jnp.asarray(keys), 0x9E3779B1, 8, 0.7))
    want = np_hash_ratio(keys, 0x9E3779B1, 8, 0.7)
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("ratio", [0.5, 0.75])
def test_cpra_join_with_tier_routing(ratio):
    mesh = data_mesh(8)
    inner, outer, _ = generate(
        seed=19, inner_tuples=1024, outer_tuples=16384,
        mode="uniform", prefer_native=False,
    )
    res, _ = cpra_join(
        inner.keys, inner.vals, outer.keys, outer.vals, mesh,
        slack=4.0, tier_ratio=ratio,
    )
    total = int(np.asarray(res.join_tuples).sum())
    ok, ov, tv = join_oracle(inner.keys, inner.vals, outer.keys, outer.vals)
    assert total == len(ok)
    mc = np.asarray(res.match_cnts).reshape(-1)
    m = mc == 1
    got = multiset_digest(
        np.asarray(res.probe_keys).reshape(-1)[m],
        np.asarray(res.probe_vals).reshape(-1)[m],
        np.asarray(res.match_vals).reshape(-1)[m],
    )
    assert got == multiset_digest(ok, ov, tv)
