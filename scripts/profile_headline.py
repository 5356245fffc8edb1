"""Capture a jax.profiler trace of the PRODUCTION fused headline join.

VERDICT r4: no profiler trace of the fused 16Mx256M phj_join exists in
any artifact; the stage-overlap question (how much of the probe
kernel's time hides behind the VPU-bound probe sort) has only ever
been answered by subtraction.  This script compiles + warms the fused
program, then traces exactly one steady-state run.

The trace lands in artifacts/trace_r5_fused/ (xplane protobufs).  On
backends where device-side tracing is unsupported (the axon tunnel is
a remote-execution layer), the trace still records host-side dispatch;
either way the captured files are summarized to stdout so the verdict
is recorded even if the trace itself cannot be parsed in-image.

Env: HJK_DATA (default /tmp/hjk_data), HJK_AB_INNER/HJK_AB_OUTER.
"""

from __future__ import annotations

import glob
import os
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    d = os.environ.get("HJK_DATA", "/tmp/hjk_data")
    ni = int(os.environ.get("HJK_AB_INNER", 16_000_000))
    no = int(os.environ.get("HJK_AB_OUTER", 256_000_000))
    out_dir = os.environ.get(
        "HJK_TRACE_DIR",
        os.path.join(os.path.dirname(__file__), "..", "artifacts",
                     "trace_r5_fused"),
    )

    import jax
    import jax.numpy as jnp

    from hash_join_codes_knl_tpu.engine.config import plan_join
    from hash_join_codes_knl_tpu.engine.phj import phj_join

    def load(tag, n):
        a = np.fromfile(os.path.join(d, f"{tag}_{n}.txt"), dtype="<u4")
        assert len(a) == n, (tag, len(a), n)
        return a

    ik = jnp.asarray(load("ik", ni))
    iv = jnp.asarray(load("iv", ni))
    ok = jnp.asarray(load("ok", no))
    ov = jnp.asarray(load("ov", no))
    plan = plan_join(ni, no)
    print(f"plan: tile={plan.tile} C={plan.probe_chunks}", flush=True)

    vary = jax.jit(lambda v, r: v ^ r, donate_argnums=0)

    def run(ov):
        res = phj_join(ik, iv, ok, ov, plan)
        # sync every output leaf via 1-elem host transfers (tunnel fence)
        jax.device_get([x.ravel()[:1] for x in jax.tree_util.tree_leaves(res)])
        return res

    t0 = time.perf_counter()
    run(ov)  # compile + warm
    print(f"warm run (incl compile): {time.perf_counter()-t0:.2f}s",
          flush=True)
    ov = vary(ov, jnp.uint32(1))
    t0 = time.perf_counter()
    run(ov)
    print(f"steady-state untraced: {time.perf_counter()-t0:.4f}s", flush=True)

    os.makedirs(out_dir, exist_ok=True)
    ov = vary(ov, jnp.uint32(3))  # 1^3 = 2: fresh payload for the traced rep
    try:
        jax.profiler.start_trace(out_dir)
        t0 = time.perf_counter()
        run(ov)
        dt = time.perf_counter() - t0
        jax.profiler.stop_trace()
        print(f"traced run: {dt:.4f}s", flush=True)
    except Exception as e:
        print(f"TRACE FAILED: {type(e).__name__}: {e}", flush=True)
        return

    files = sorted(glob.glob(os.path.join(out_dir, "**", "*"),
                             recursive=True))
    for f in files:
        if os.path.isfile(f):
            print(f"  {os.path.getsize(f):>12} {os.path.relpath(f, out_dir)}",
                  flush=True)


if __name__ == "__main__":
    main()
