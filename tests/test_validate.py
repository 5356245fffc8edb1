"""BG-debug-mode analog: oracle-free invariant re-checks."""

import dataclasses

import numpy as np
import pytest

from hash_join_codes_knl_tpu.engine.phj import JoinResult, join
from hash_join_codes_knl_tpu.engine.validate import validate_join_result
from hash_join_codes_knl_tpu.relgen.generate import generate


@pytest.fixture()
def joined():
    inner, outer, _ = generate(seed=67, inner_tuples=1024,
                               outer_tuples=8000, mode="uniform",
                               prefer_native=False)
    res, plan = join(inner.keys, inner.vals, outer.keys, outer.vals)
    return res, plan, outer


def test_valid_result_passes(joined):
    res, plan, outer = joined
    stats = validate_join_result(res, outer.keys, plan)
    assert stats["live_slots"] == 8000
    assert stats["join_tuples"] == 8000


def _tamper(res, **cols):
    fields = dict(
        probe_keys=np.asarray(res.probe_keys).copy(),
        probe_vals=np.asarray(res.probe_vals).copy(),
        match_vals=np.asarray(res.match_vals).copy(),
        match_cnts=np.asarray(res.match_cnts).copy(),
        build_counts=np.asarray(res.build_counts).copy(),
    )
    for name, fn in cols.items():
        fn(fields[name])
    return JoinResult(**fields)


def test_dropped_tuple_caught(joined):
    res, plan, outer = joined

    def drop_one(pk):
        live = np.flatnonzero(pk != 0)
        pk[live[3]] = 0

    with pytest.raises(ValueError, match="conservation"):
        validate_join_result(_tamper(res, probe_keys=drop_one),
                             outer.keys, plan)


def test_swapped_key_caught(joined):
    res, plan, outer = joined

    def corrupt(pk):
        live = np.flatnonzero(pk != 0)
        pk[live[0]] ^= 0x10  # same count, different checksum

    with pytest.raises(ValueError, match="checksum"):
        validate_join_result(_tamper(res, probe_keys=corrupt),
                             outer.keys, plan)


def test_pad_hygiene_caught(joined):
    res, plan, outer = joined
    pk = np.asarray(res.probe_keys)
    if not (pk == 0).any():
        pytest.skip("no pad slots in this layout")

    def dirty_pad(mc):
        mc[np.flatnonzero(pk == 0)[0]] = 1

    with pytest.raises(ValueError, match="pad hygiene"):
        validate_join_result(_tamper(res, match_cnts=dirty_pad),
                             outer.keys, plan)


def test_monotonicity_caught(joined):
    res, plan, outer = joined

    def scramble_order(pk):
        live = np.flatnonzero(pk != 0)
        a, b = live[0], live[-1]
        pk[a], pk[b] = pk[b], pk[a]

    # swapping two (distinct) keys preserves the checksum but breaks the
    # hash order of the merge layout
    bad = _tamper(res, probe_keys=scramble_order)
    if np.asarray(bad.probe_keys).tolist() == np.asarray(
        res.probe_keys
    ).tolist():
        pytest.skip("degenerate swap")
    with pytest.raises(ValueError, match="monotonicity"):
        validate_join_result(bad, outer.keys, plan)


def test_cli_check_flag(capsys):
    from hash_join_codes_knl_tpu.cli import main

    assert main(["phj", "1", "4096", "4096", "--seed", "3", "--json",
                 "--check"]) == 0
    import json

    out = json.loads(capsys.readouterr().out.strip())
    assert "check_s" in out
