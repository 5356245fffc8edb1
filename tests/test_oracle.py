"""Join-oracle tests: vs brute force, digests, cardinality formula."""

import numpy as np

from hash_join_codes_knl_tpu.engine.oracle import (
    canonical_order,
    join_oracle,
    multiset_digest,
)
from hash_join_codes_knl_tpu.relation import expected_join_tuples
from hash_join_codes_knl_tpu.relgen.generate import generate


def _brute(ik, iv, ok, ov):
    rows = []
    for o in range(len(ok)):
        for i in range(len(ik)):
            if ik[i] == ok[o]:
                rows.append((ok[o], ov[o], iv[i]))
    rows.sort()
    return np.array(rows, dtype=np.uint32).reshape(-1, 3)


def test_oracle_matches_brute_force():
    rng = np.random.default_rng(0)
    ik = rng.integers(0, 50, 200, dtype=np.uint32)
    iv = rng.integers(0, 2**32, 200, dtype=np.uint32)
    ok = rng.integers(0, 50, 300, dtype=np.uint32)
    ov = rng.integers(0, 2**32, 300, dtype=np.uint32)
    k, v, t = canonical_order(*join_oracle(ik, iv, ok, ov))
    got = np.stack([k, v, t], axis=1)
    want = _brute(ik, iv, ok, ov)
    np.testing.assert_array_equal(got, want)


def test_digest_is_order_independent_and_discriminating():
    rng = np.random.default_rng(1)
    k = rng.integers(0, 2**32, 1000, dtype=np.uint32)
    v = rng.integers(0, 2**32, 1000, dtype=np.uint32)
    t = rng.integers(0, 2**32, 1000, dtype=np.uint32)
    d1 = multiset_digest(k, v, t)
    perm = rng.permutation(1000)
    d2 = multiset_digest(k[perm], v[perm], t[perm])
    assert d1 == d2
    t2 = t.copy()
    t2[500] ^= 1
    assert multiset_digest(k, v, t2) != d1
    # column swap must not collide (rows are position-sensitive)
    assert multiset_digest(t, v, k) != d1


def test_oracle_cardinality_matches_formula_on_generated_data():
    for inner_n, outer_n, selc, mode in (
        (1024, 1024, 1.0, "ref"),
        (512, 4096, 1.0, "uniform"),
        (512, 4096, 0.5, "uniform"),
    ):
        inner, outer, _ = generate(
            seed=13, inner_tuples=inner_n, outer_tuples=outer_n, selc=selc,
            mode=mode, prefer_native=False,
        )
        k, v, t = join_oracle(inner.keys, inner.vals, outer.keys, outer.vals)
        want = expected_join_tuples(inner_n, outer_n, selc)
        # uniform repeat picks make the realized cardinality stochastic around
        # the expectation; exact when selc == 1 and outer multiplicity is
        # deterministic per key.
        if selc == 1.0:
            assert len(k) == want
        else:
            assert abs(len(k) - want) < 0.15 * want


def test_digest_distinguishes_column_aliasing():
    """Rows that collided under the old shifted-xor row hash (key bits
    21-31 aliasing val bits 0-10; tab bits 22-31 falling off the u64
    top) must digest apart under the chained per-column mix."""
    d = lambda k, v, t: multiset_digest(
        np.array([k], np.uint32), np.array([v], np.uint32),
        np.array([t], np.uint32))
    assert d(0, 1, 7) != d(2097152, 0, 7)          # key<->val bit alias
    assert d(5, 6, 0) != d(5, 6, 1 << 22)          # tab high bits
    assert d(1, 2, 3) == d(1, 2, 3)                # determinism
