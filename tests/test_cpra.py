"""Distributed CPRA join on an 8-virtual-device CPU mesh vs the oracle."""

import jax
import numpy as np
import pytest

from hash_join_codes_knl_tpu.engine.config import JoinPlan
from hash_join_codes_knl_tpu.engine.oracle import join_oracle, multiset_digest
from hash_join_codes_knl_tpu.parallel.cpra import cpra_join, pack_by_owner
from hash_join_codes_knl_tpu.relgen.generate import generate

import jax.numpy as jnp


def _digest_aligned(res):
    mc = np.asarray(res.match_cnts).reshape(-1)
    assert mc.max(initial=0) <= 1
    m = mc == 1
    return multiset_digest(
        np.asarray(res.probe_keys).reshape(-1)[m],
        np.asarray(res.probe_vals).reshape(-1)[m],
        np.asarray(res.match_vals).reshape(-1)[m],
    )


def test_pack_by_owner_roundtrip():
    rng = np.random.default_rng(0)
    keys = rng.integers(1, 2**32, 1000, dtype=np.uint32)
    vals = rng.integers(0, 2**32, 1000, dtype=np.uint32)
    owner = rng.integers(0, 4, 1000).astype(np.int32)
    bk, bv, cnt = pack_by_owner(
        jnp.asarray(keys), jnp.asarray(vals), jnp.asarray(owner), 4, 512
    )
    bk, bv, cnt = np.asarray(bk), np.asarray(bv), np.asarray(cnt)
    assert cnt.sum() == 1000
    for c in range(4):
        np.testing.assert_array_equal(bk[c, : cnt[c]], keys[owner == c])
        np.testing.assert_array_equal(bv[c, : cnt[c]], vals[owner == c])
        assert (bk[c, cnt[c] :] == 0).all()


@pytest.mark.parametrize("n_chips", [2, 8])
@pytest.mark.parametrize(
    "kw",
    [
        dict(inner_tuples=4096, outer_tuples=4096, mode="ref"),
        dict(inner_tuples=2048, outer_tuples=32768, mode="uniform"),
        dict(inner_tuples=2048, outer_tuples=32768, mode="zipf", zipf=0.75),
        dict(inner_tuples=4096, outer_tuples=32768, mode="uniform", selc=0.5),
    ],
)
def test_cpra_matches_oracle(n_chips, kw):
    inner, outer, _ = generate(seed=31, prefer_native=False, **kw)
    mesh = jax.make_mesh((n_chips,), ("x",))
    plan = JoinPlan(p_bits=6, slots=256, tile=256, pass_bits=(6,))
    res, _ = cpra_join(
        inner.keys, inner.vals, outer.keys, outer.vals, mesh, plan, slack=4.0
    )
    want = multiset_digest(
        *join_oracle(inner.keys, inner.vals, outer.keys, outer.vals)
    )
    assert _digest_aligned(res) == want


def test_cpra_overflow_detection():
    # all keys identical -> one owner chip gets everything -> tiny caps blow
    keys = np.full(4096, 12345, dtype=np.uint32)
    vals = keys.copy()
    mesh = jax.make_mesh((8,), ("x",))
    plan = JoinPlan(p_bits=4, slots=64, tile=128, pass_bits=(4,))
    with pytest.raises(RuntimeError, match="overflow"):
        cpra_join(keys, vals, keys, vals, mesh, plan, slack=1.0)
