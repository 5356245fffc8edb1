"""Distributed NPJ (replicated shared table) on the 8-virtual-device mesh."""

import numpy as np

from hash_join_codes_knl_tpu.engine.oracle import join_oracle, multiset_digest
from hash_join_codes_knl_tpu.parallel.distributed import data_mesh
from hash_join_codes_knl_tpu.parallel.npj_dist import npj_join_dist
from hash_join_codes_knl_tpu.relgen.generate import generate


def test_npj_dist_matches_oracle():
    mesh = data_mesh(8)
    inner, outer, _ = generate(
        seed=11, inner_tuples=2048, outer_tuples=16384,
        mode="uniform", prefer_native=False,
    )
    mv, mc, total, _ = npj_join_dist(
        inner.keys, inner.vals, outer.keys, outer.vals, mesh
    )
    ok, ov, tv = join_oracle(inner.keys, inner.vals, outer.keys, outer.vals)
    assert total == len(ok)
    # match arrays align to the outer relation order
    m = mc == 1
    got = multiset_digest(outer.keys[m], outer.vals[m], mv[m])
    assert got == multiset_digest(ok, ov, tv)


def test_npj_dist_single_device():
    mesh = data_mesh(1)
    inner, outer, _ = generate(
        seed=13, inner_tuples=512, outer_tuples=2048,
        mode="uniform", prefer_native=False,
    )
    _, mc, total, _ = npj_join_dist(
        inner.keys, inner.vals, outer.keys, outer.vals, mesh
    )
    assert total == int(np.sum(mc))
    assert total == len(
        join_oracle(inner.keys, inner.vals, outer.keys, outer.vals)[0]
    )


def test_npj_dist_odd_relation_sizes():
    """Odd relation lengths shard via null-key padding; the aligned
    outputs trim back to the input length (pads land at the tail of
    the last shard)."""
    rng = np.random.default_rng(43)
    ik = np.unique(rng.integers(1, 2**32, 3000, dtype=np.uint32))[:1255]
    iv = rng.integers(0, 2**32, 1255, dtype=np.uint32)
    ok = ik[rng.integers(0, 1255, 9377)].astype(np.uint32)
    ov = rng.integers(0, 2**32, 9377, dtype=np.uint32)
    mesh = data_mesh(8)
    mv, mc, total, _ = npj_join_dist(ik, iv, ok, ov, mesh)
    want = join_oracle(ik, iv, ok, ov)
    assert len(mv) == len(mc) == 9377
    assert total == len(want[0])
    assert int(np.asarray(mc).astype(np.int64).sum()) == len(want[0])
