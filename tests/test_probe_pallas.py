"""Pallas probe kernel vs the jnp oracle (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from hash_join_codes_knl_tpu.engine.config import DEFAULT_FACTOR
from hash_join_codes_knl_tpu.ops.partition import (
    PROBE_TILE_GROUP,
    build_dense_table_jnp,
    compute_pids,
    partition_padded_jnp,
    tile_pids,
)
from hash_join_codes_knl_tpu.ops.probe import probe_tiles_jnp
from hash_join_codes_knl_tpu.ops.probe_pallas import probe_tiles_pallas


def test_probe_pallas_matches_jnp_oracle():
    rng = np.random.default_rng(7)
    P_BITS, P, S, T = 4, 16, 256, 256
    ik = rng.integers(1, 5000, 2000, dtype=np.uint32)
    iv = rng.integers(0, 2**32, 2000, dtype=np.uint32)
    ok = rng.integers(1, 5000, 8192, dtype=np.uint32)
    ov = rng.integers(0, 2**32, 8192, dtype=np.uint32)

    ipid = compute_pids(jnp.asarray(ik), DEFAULT_FACTOR, P_BITS)
    tk, tv, bc = build_dense_table_jnp(jnp.asarray(ik), jnp.asarray(iv), ipid, P, S)
    assert int(np.asarray(bc).max()) <= S
    opid = compute_pids(jnp.asarray(ok), DEFAULT_FACTOR, P_BITS)
    pk, pv, offsets, _ = partition_padded_jnp(
        jnp.asarray(ok), jnp.asarray(ov), opid, P, T
    )
    n_tiles = pk.shape[0] // T
    tpid = tile_pids(offsets, n_tiles, T)

    mv0, mc0 = probe_tiles_jnp(pk, tk, tv, bc, tpid, T, group=PROBE_TILE_GROUP)
    mv1, mc1 = probe_tiles_pallas(pk, tk, tv, tpid, T, interpret=True)
    np.testing.assert_array_equal(np.asarray(mc1), np.asarray(mc0))
    np.testing.assert_array_equal(np.asarray(mv1), np.asarray(mv0))
    assert int(np.asarray(mc1).sum()) > 0


def test_probe_pallas_chunked_path(monkeypatch):
    import hash_join_codes_knl_tpu.ops.probe_pallas as pp

    monkeypatch.setattr(pp, "MAX_TILES_PER_CALL", 8)  # force chunking
    rng = np.random.default_rng(9)
    P_BITS, P, S, T = 4, 16, 256, 256
    ik = rng.integers(1, 5000, 1000, dtype=np.uint32)
    iv = rng.integers(0, 2**32, 1000, dtype=np.uint32)
    ok = rng.integers(1, 5000, 8192, dtype=np.uint32)
    ov = rng.integers(0, 2**32, 8192, dtype=np.uint32)
    ipid = compute_pids(jnp.asarray(ik), DEFAULT_FACTOR, P_BITS)
    tk, tv, bc = build_dense_table_jnp(jnp.asarray(ik), jnp.asarray(iv), ipid, P, S)
    opid = compute_pids(jnp.asarray(ok), DEFAULT_FACTOR, P_BITS)
    pk, pv, offsets, _ = partition_padded_jnp(
        jnp.asarray(ok), jnp.asarray(ov), opid, P, T
    )
    n_tiles = pk.shape[0] // T
    tpid = tile_pids(offsets, n_tiles, T)
    mv0, mc0 = probe_tiles_jnp(pk, tk, tv, bc, tpid, T, group=PROBE_TILE_GROUP)
    mv1, mc1 = pp.probe_tiles_pallas(pk, tk, tv, tpid, T, interpret=True)
    np.testing.assert_array_equal(np.asarray(mc1), np.asarray(mc0))
    np.testing.assert_array_equal(np.asarray(mv1), np.asarray(mv0))


def test_merge_probe_many_tiles_wide_window():
    """n_tiles > 128 exercises the SMEM wrow double-buffer ROLLOVER (the
    kernel stages window rows into SMEM 128 tiles at a time); w_chunks=6
    exercises sweeps wider than any other off-TPU test.  Both paths
    previously executed only on real TPU in the bench."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from hash_join_codes_knl_tpu.engine.phj import _merge_windows
    from hash_join_codes_knl_tpu.ops.merge_probe_pallas import (
        merge_probe_jnp,
        merge_probe_pallas,
    )

    rng = np.random.default_rng(11)
    tile, window, n_tiles, rows = 128, 768, 320, 64
    cap = n_tiles * tile
    bhk = np.sort(rng.integers(1, 2**32, rows * 128, dtype=np.uint32))
    bval = rng.integers(0, 2**32, rows * 128, dtype=np.uint32)
    hits = bhk[rng.integers(0, len(bhk), cap // 2)]
    miss = rng.integers(1, 2**32, cap - cap // 2, dtype=np.uint32)
    ohk = jnp.asarray(np.sort(np.concatenate([hits, miss]).astype(np.uint32)))
    bhk2 = jnp.asarray(bhk).reshape(rows, 128)
    bval2 = jnp.asarray(bval).reshape(rows, 128)
    wrow, stats = _merge_windows(jnp.asarray(bhk), ohk, tile, window, rows)
    assert int(stats[0]) == 0
    with pltpu.force_tpu_interpret_mode():
        mv1, mc1 = merge_probe_pallas(ohk, bhk2, bval2, wrow, tile, window)
    mv0, mc0 = merge_probe_jnp(ohk, bhk2, bval2, wrow, tile, window)
    np.testing.assert_array_equal(np.asarray(mc1), np.asarray(mc0))
    np.testing.assert_array_equal(np.asarray(mv1), np.asarray(mv0))
    assert int(np.asarray(mc1).sum()) >= cap // 2  # the planted hits


def test_merge_probe_constant_key_tiles():
    """Heavy-hitter runs: tiles of one repeated key hit the broadcast
    fast path and must agree with the jnp oracle."""
    import jax.numpy as jnp
    import numpy as np

    from hash_join_codes_knl_tpu.engine.config import JoinPlan
    from hash_join_codes_knl_tpu.engine.phj import materialize, phj_join
    from hash_join_codes_knl_tpu.engine.oracle import (
        join_oracle,
        multiset_digest,
    )

    rng = np.random.default_rng(3)
    ik = np.unique(rng.integers(1, 2**32, 3000, dtype=np.uint32))[:2048]
    iv = ik * np.uint32(3)
    hot = ik[42]
    ok = ik[rng.integers(0, 2048, 16384)].astype(np.uint32)
    ok[: 16384 // 2] = hot  # half the probe stream is one key
    ov = rng.integers(0, 2**32, 16384, dtype=np.uint32)
    plan = JoinPlan(p_bits=6, slots=256, tile=512, pass_bits=(6,),
                    probe_impl="merge_pallas", window=512)
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        res = phj_join(jnp.asarray(ik), jnp.asarray(iv), jnp.asarray(ok),
                       jnp.asarray(ov), plan)
    assert int(np.asarray(res.build_counts)[0]) == 0
    got = multiset_digest(*materialize(res))
    want = multiset_digest(*join_oracle(ik, iv, ok, ov))
    assert got == want


def _gather_case(bhk, bval, ohk, tile, window):
    """Run the gather kernel (BOTH select engines) + jnp oracle on
    explicitly constructed sorted arrays; all must agree exactly."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from hash_join_codes_knl_tpu.engine.phj import _merge_windows
    from hash_join_codes_knl_tpu.ops.merge_probe_gather import (
        merge_probe_gather,
    )
    from hash_join_codes_knl_tpu.ops.merge_probe_pallas import merge_probe_jnp

    rows = len(bhk) // 128
    bhk2 = jnp.asarray(bhk).reshape(rows, 128)
    bval2 = jnp.asarray(bval).reshape(rows, 128)
    ohk_j = jnp.asarray(ohk)
    wrow, stats = _merge_windows(jnp.asarray(bhk), ohk_j, tile, window, rows)
    assert int(stats[0]) == 0
    mv0, mc0 = merge_probe_jnp(ohk_j, bhk2, bval2, wrow, tile, window)
    # every select engine at the production row_skip=False default, plus
    # the row_skip=True ablation path (HJK_GATHER_ROW_SKIP) once.
    # rowbase runs with a FULL-window slice (k_sel=window//128, never
    # overflows -- the narrow-slice overflow path has its own test)
    for select, row_skip in (("flat", False), ("hier", False),
                             ("rowbase", False), ("flat", True)):
        with pltpu.force_tpu_interpret_mode():
            mv1, mc1, sovf = merge_probe_gather(
                ohk_j, bhk2, bval2, wrow, tile, window, select=select,
                row_skip=row_skip, k_sel=window // 128,
            )
        assert int(sovf) == 0, f"{select} skip={row_skip}"
        np.testing.assert_array_equal(np.asarray(mc1), np.asarray(mc0),
                                      err_msg=f"{select} skip={row_skip}")
        np.testing.assert_array_equal(np.asarray(mv1), np.asarray(mv0),
                                      err_msg=f"{select} skip={row_skip}")
    mc_exact = np.asarray(mc1)
    # narrow-slice rowbase: the production shape (k_sel < window chunks).
    # The kernel contract is "sovf == 0 implies exact"; a case whose
    # spans exceed the slice must COUNT it (never return silently wrong
    # results), which the long-duplicate-run case exercises.
    if window // 128 > 8:
        with pltpu.force_tpu_interpret_mode():
            mv1, mc1, sovf = merge_probe_gather(
                ohk_j, bhk2, bval2, wrow, tile, window,
                select="rowbase", k_sel=8,
            )
        if int(sovf) == 0:
            np.testing.assert_array_equal(np.asarray(mc1), np.asarray(mc0),
                                          err_msg="rowbase k=8")
            np.testing.assert_array_equal(np.asarray(mv1), np.asarray(mv0),
                                          err_msg="rowbase k=8")
        else:
            assert (np.asarray(mc1) <= np.asarray(mc0)).all(), \
                "overflowing rowbase may under-count, never over-count"
    return mc_exact


def test_merge_probe_gather_uniform():
    rng = np.random.default_rng(31)
    n_build = 24 * 128
    bhk = np.sort(rng.integers(1, 2**32, n_build, dtype=np.uint32))
    bval = rng.integers(0, 2**32, n_build, dtype=np.uint32)
    cap = 16 * 2048
    hits = bhk[rng.integers(0, n_build, cap // 2)]
    miss = rng.integers(1, 2**32, cap - cap // 2, dtype=np.uint32)
    ohk = np.sort(np.concatenate([hits, miss]).astype(np.uint32))
    mc = _gather_case(bhk, bval, ohk, tile=2048, window=768)
    assert mc.sum() >= cap // 2


def test_merge_probe_gather_long_duplicate_runs():
    """Runs of one key spanning MANY 128-slot chunks: the middle-chunk
    arithmetic (128 * (ce-cs-1)) must count them exactly, and the
    max-val must come from the run's end (val-ascending runs)."""
    rng = np.random.default_rng(32)
    uniq = np.sort(
        np.unique(rng.integers(1, 2**32, 900, dtype=np.uint32))
    )[:800]
    reps = np.ones(800, np.int64)
    reps[100] = 700   # ~5.5 chunks of one key
    reps[500] = 1300  # ~10 chunks
    reps[799] = 260   # run ending at the build tail
    bhk = np.repeat(uniq, reps).astype(np.uint32)
    pad = (-len(bhk)) % 128
    bhk = np.concatenate([np.zeros(pad, np.uint32), bhk])  # pads front
    bhk = np.sort(bhk)
    bval = rng.integers(0, 2**32, len(bhk), dtype=np.uint32)
    # val-ascending within equal-key runs (the engine sorts num_keys=2)
    order = np.lexsort((bval, bhk))
    bhk, bval = bhk[order], bval[order]
    cap = 8 * 2048
    ohk = uniq[rng.integers(0, 800, cap)].astype(np.uint32)
    ohk[: cap // 8] = uniq[100]  # hammer the long runs
    ohk[cap // 8 : cap // 4] = uniq[500]
    ohk = np.sort(ohk)
    mc = _gather_case(bhk, bval, ohk, tile=2048, window=1664)
    assert mc.max() == 1300


def test_merge_probe_gather_wide_window_and_max_key():
    """Production-width window (118 chunks, the re-planned geometry):
    exercises the hier select's multi-block coarse level, plus the
    0xFFFFFFFF probe edge where imax pads would miscount an unmasked
    <= compare."""
    rng = np.random.default_rng(34)
    n_build = 130 * 128
    bhk = rng.integers(1, 2**32, n_build, dtype=np.uint32)
    bhk[: 300] = 0xFFFFFFFF  # a duplicate run at the key-domain top
    bhk = np.sort(bhk)
    bval = rng.integers(0, 2**32, n_build, dtype=np.uint32)
    order = np.lexsort((bval, bhk))
    bhk, bval = bhk[order], bval[order]
    cap = 4 * 1024
    ohk = bhk[rng.integers(0, n_build, cap)].astype(np.uint32)
    ohk[: cap // 8] = 0xFFFFFFFF
    ohk = np.sort(ohk)
    mc = _gather_case(bhk, bval, ohk, tile=1024, window=118 * 128)
    assert mc.max() >= 300


def test_merge_probe_gather_boundary_and_pads():
    """Probes equal to a window chunk's first element (the cs=-1 clamp
    edge), probe pads (key 0), and constant-key tiles."""
    rng = np.random.default_rng(33)
    n_build = 16 * 128
    bhk = np.sort(rng.integers(1, 2**32, n_build, dtype=np.uint32))
    bval = np.arange(n_build, dtype=np.uint32)
    cap = 8 * 1024
    # probe exactly the chunk-first elements, repeatedly
    firsts = bhk[::128]
    ohk = np.concatenate([
        np.repeat(firsts, 64),
        bhk[rng.integers(0, n_build, cap - 64 * len(firsts) - 1500)],
        np.zeros(1500, np.uint32),  # pads
    ]).astype(np.uint32)
    ohk = np.sort(ohk)
    mc = _gather_case(bhk, bval, ohk, tile=1024, window=896)
    assert mc[np.sort(ohk) == 0].sum() == 0 if (ohk == 0).any() else True


def test_window_probe_smem_chunk_boundaries():
    """More than 256 probe tiles: the kernel stages its per-tile window
    rows into SMEM 128 tiles at a time -- this crosses >= 2 staging
    boundaries and checks the prefetch handoff (only the FIRST boundary
    loads the current chunk; later boundaries rely on the previous
    boundary's prefetch).  Interpret mode vs the jnp oracle."""
    import jax.numpy as jnp
    from jax.experimental.pallas import tpu as pltpu

    from hash_join_codes_knl_tpu.engine.phj import _merge_windows
    from hash_join_codes_knl_tpu.ops.merge_probe_pallas import (
        merge_probe_jnp,
        merge_probe_pallas,
    )

    rng = np.random.default_rng(35)
    n_build = 64 * 128
    bhk = np.sort(rng.integers(1, 2**32, n_build, dtype=np.uint32))
    bval = rng.integers(0, 2**32, n_build, dtype=np.uint32)
    tile, n_tiles = 128, 300  # 3 SMEM staging chunks
    cap = tile * n_tiles
    ohk = np.sort(bhk[rng.integers(0, n_build, cap)].astype(np.uint32))
    bhk2 = jnp.asarray(bhk).reshape(-1, 128)
    bval2 = jnp.asarray(bval).reshape(-1, 128)
    window = 768
    wrow, stats = _merge_windows(jnp.asarray(bhk), jnp.asarray(ohk), tile,
                                 window, n_build // 128)
    assert int(stats[0]) == 0
    mv0, mc0 = merge_probe_jnp(jnp.asarray(ohk), bhk2, bval2, wrow, tile,
                               window)
    with pltpu.force_tpu_interpret_mode():
        mv1, mc1 = merge_probe_pallas(jnp.asarray(ohk), bhk2, bval2, wrow,
                                      tile, window)
    np.testing.assert_array_equal(np.asarray(mc1), np.asarray(mc0))
    np.testing.assert_array_equal(np.asarray(mv1), np.asarray(mv0))
