"""Distributed NPJ: the shared-global-table join on a chip mesh.

The reference NPJ (npj.cpp:769-927) has every thread build into ONE shared
open-addressing table through CAS, then every thread probe its outer slice
against it.  The TPU translation of "one table all workers can reach" is a
table REPLICATED per chip (SURVEY.md section 2.5, shared-state row): chips
`all_gather` the sharded build side over ICI, each builds the identical
global table locally (the build is deterministic and insertion-order
independent, engine/npj.py), and probes only its own outer shard.  No
communication happens during the probe -- exactly the reference's phase
structure (barrier-fenced build phase, then an embarrassingly parallel
probe phase, npj.cpp:861-897).

This is the degenerate baseline by design: build work is duplicated C times
and the table occupies HBM on every chip.  It wins only when the build side
is small; PHJ/CPRA own every other regime, as on KNL.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..engine.npj import NpjPlan, npj_build, npj_probe, plan_npj


def make_npj_step(mesh: Mesh, plan: NpjPlan, axis: str = "x"):
    """Jitted distributed NPJ step: (ik, iv, ok, ov) sharded along `axis`
    -> (match_vals, match_cnts aligned to the local outer shard,
    join_tuples scalar, build_overflow scalar)."""

    def local_step(ik, iv, ok, ov):
        # build phase: replicate the build side (the "shared table"),
        # build the identical table on every chip
        gik = jax.lax.all_gather(ik, axis, tiled=True)
        giv = jax.lax.all_gather(iv, axis, tiled=True)
        tk, tv, overflow = npj_build(gik, giv, plan)
        # probe phase: local outer shard only, no communication
        mv, mc = npj_probe(tk, tv, ok, plan)
        total = jax.lax.psum(jnp.sum(mc.astype(jnp.uint32)), axis)
        return mv, mc, total, overflow

    spec = P(axis)
    return jax.jit(
        jax.shard_map(
            local_step,
            mesh=mesh,
            in_specs=(spec, spec, spec, spec),
            out_specs=(spec, spec, P(), P()),
            check_vma=False,
        )
    )


def npj_join_dist(inner_keys, inner_vals, outer_keys, outer_vals,
                  mesh: Mesh, plan: NpjPlan | None = None, axis: str = "x"):
    """Convenience front end; returns (match_vals, match_cnts, join_tuples,
    plan) with match arrays aligned to the outer relation order."""
    if plan is None:
        plan = plan_npj(len(inner_keys))
    step = make_npj_step(mesh, plan, axis)
    sh = NamedSharding(mesh, P(axis))
    dev = lambda x: jax.device_put(jnp.asarray(x), sh)
    mv, mc, total, overflow = step(
        dev(inner_keys), dev(inner_vals), dev(outer_keys), dev(outer_vals)
    )
    if int(overflow) > 0:
        raise RuntimeError("build table margin overflow; lower the load")
    return np.asarray(mv), np.asarray(mc), int(total), plan
