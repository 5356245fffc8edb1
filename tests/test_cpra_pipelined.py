"""Chunked exchange/compute pipeline vs the oracle (8-device CPU mesh)."""

import jax
import numpy as np

from hash_join_codes_knl_tpu.engine.config import JoinPlan
from hash_join_codes_knl_tpu.engine.oracle import join_oracle, multiset_digest
from hash_join_codes_knl_tpu.parallel.cpra import make_cpra_step_pipelined
from hash_join_codes_knl_tpu.relgen.generate import generate

from jax.sharding import NamedSharding, PartitionSpec as P


def test_pipelined_cpra_matches_oracle():
    n_chips, chunks = 8, 4
    inner, outer, _ = generate(
        seed=47, inner_tuples=2048, outer_tuples=32768,
        mode="uniform", prefer_native=False,
    )
    mesh = jax.make_mesh((n_chips,), ("x",))
    plan = JoinPlan(p_bits=5, slots=128, tile=256, pass_bits=(5,))
    inner_cap = 4 * 2048 // (n_chips * n_chips)
    outer_cap = 4 * 32768 // (n_chips * n_chips)
    step = make_cpra_step_pipelined(mesh, plan, inner_cap, outer_cap, chunks)
    sh = NamedSharding(mesh, P("x"))
    dev = lambda x: jax.device_put(np.asarray(x), sh)
    res, overflow = step(
        dev(inner.keys), dev(inner.vals), dev(outer.keys), dev(outer.vals)
    )
    assert not bool(overflow)
    mc = np.asarray(res.match_cnts).reshape(-1)
    m = mc == 1
    got = multiset_digest(
        np.asarray(res.probe_keys).reshape(-1)[m],
        np.asarray(res.probe_vals).reshape(-1)[m],
        np.asarray(res.match_vals).reshape(-1)[m],
    )
    want = multiset_digest(
        *join_oracle(inner.keys, inner.vals, outer.keys, outer.vals)
    )
    assert got == want
