"""Plan policies: reference pass policy parity + auto-plan invariants."""

from hash_join_codes_knl_tpu.engine.config import (
    JoinPlan,
    plan_join,
    reference_pass_plan,
)


def test_reference_pass_policy_thresholds():
    # phj.cpp:1791-1808 with hash_table_limit=6400
    assert reference_pass_plan(6400 * 5) == ()  # partitions=5 <= 10
    assert reference_pass_plan(6400 * 100) == (100,)  # 1 pass
    p2 = reference_pass_plan(6400 * 10_000)  # partitions=10000 -> 2 passes
    assert len(p2) == 2 and p2[0] * p2[1] <= 10_000 < (p2[0] + 1) ** 2
    p3 = reference_pass_plan(6400 * 100_000)  # -> 3 passes
    assert len(p3) == 3
    prod = p3[0] * p3[1] * p3[2]
    assert prod <= 100_000
    p4 = reference_pass_plan(6400 * 2_000_000)  # -> 4 passes
    assert len(p4) == 4


def test_plan_join_invariants():
    for ni, no in [(16_000_000, 256_000_000), (1024, 8192), (100, 100)]:
        p = plan_join(ni, no)
        assert sum(p.pass_bits) == p.p_bits
        assert p.slots >= 64 and p.tile % 128 == 0
        assert p.num_partitions == 1 << p.p_bits


def test_replan_from_span_stays_under_tile_aware_cap():
    """Property: for ANY (plan geometry, measured span), the re-planned
    window is a 128-multiple strictly within the compile ceiling of the
    plan's (possibly shrunk) tile -- one chunk past it crashes the
    remote compiler or silently drops to the dense sweep."""
    import numpy as np

    from hash_join_codes_knl_tpu.engine.config import JoinPlan
    from hash_join_codes_knl_tpu.engine.phj import (
        replan_from_span,
        replan_window_cap,
    )

    rng = np.random.default_rng(17)
    for _ in range(300):
        tile = 128 * int(rng.integers(1, 40))
        C = int(rng.integers(0, 80))
        span = int(rng.integers(1, 3_000_000))
        plan = JoinPlan(p_bits=4, slots=128, tile=tile, pass_bits=(4,),
                        probe_chunks=C)
        new = replan_from_span(plan, span)
        assert new.window % 128 == 0
        assert new.window <= replan_window_cap(new.tile), (
            tile, C, span, new)
        assert new.tile % 128 == 0 and new.tile >= 128


def test_merge_params_auto_window_always_compilable():
    """Property: auto windows (no explicit plan.window) never exceed
    the tile-aware ceiling at any geometry, including unchunked
    huge-build/small-probe shapes."""
    import numpy as np

    from hash_join_codes_knl_tpu.engine.config import JoinPlan
    from hash_join_codes_knl_tpu.engine.phj import (
        _merge_params,
        replan_window_cap,
    )

    rng = np.random.default_rng(19)
    for _ in range(200):
        tile = 128 * int(rng.integers(1, 40))
        C = int(rng.integers(0, 66))
        ni = int(rng.integers(1, 1 << 27))
        no = int(rng.integers(1, 1 << 27))
        plan = JoinPlan(p_bits=4, slots=128, tile=tile, pass_bits=(4,),
                        probe_chunks=C)
        t, window, rows_total, cap = _merge_params(plan, ni, no)
        assert window % 128 == 0
        assert window <= replan_window_cap(tile), (tile, C, ni, no, window)
