"""Phase timing and structured metrics (tracing subsystem, SURVEY.md sec 5).

The reference stamps per-thread phase boundaries into times[8] / timelog[]
arrays (hj.h:39,69-70; npj.cpp:878-915) and prints min/max/avg across
threads.  Here a phase is a jit-compiled stage: the timer runs the stage,
blocks on its outputs, and records wall time; `timeline` keeps the TIMELOG
analog (monotonic stamps per phase boundary).  Metrics are emitted as one
JSON object (tuples/s, per-stage seconds, bytes moved) instead of printf.
"""

from __future__ import annotations

import json
import time

import jax


class PhaseTimer:
    def __init__(self):
        self.phases: dict[str, float] = {}
        self.timeline: list[tuple[str, float]] = []
        self._t0 = time.perf_counter()

    def run(self, name: str, fn, *args, **kw):
        """Run fn, block until its outputs are ready, record the phase.

        Sync is a one-element host transfer on top of block_until_ready:
        on tunneled backends (axon) block_until_ready alone returns before
        the device is done, which would fold every phase into the last one.
        """
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        out = jax.block_until_ready(out)
        probes = []
        for leaf in jax.tree_util.tree_leaves(out):
            if not (hasattr(leaf, "ravel") and getattr(leaf, "size", 0)):
                continue
            try:
                # a 1-element slice depends on the whole buffer; pulling it
                # to the host is the fence (NOT addressable_shards[].data,
                # which bypasses the dependency on tunneled backends)
                probes.append(leaf.ravel()[:1])
            except Exception:
                # sharded arrays reject ambiguous gathers; a reduction has
                # a well-defined replicated sharding
                import jax.numpy as jnp

                probes.append(jnp.sum(leaf))
        if probes:
            jax.device_get(probes)
        dt = time.perf_counter() - t0
        self.phases[name] = self.phases.get(name, 0.0) + dt
        self.timeline.append((name, time.perf_counter() - self._t0))
        return out

    @property
    def total(self) -> float:
        return sum(self.phases.values())

    def metrics(self, **extra) -> dict:
        out = {f"{k}_s": round(v, 6) for k, v in self.phases.items()}
        out["total_s"] = round(self.total, 6)
        out.update(extra)
        return out

    def report(self, **extra) -> str:
        return json.dumps(self.metrics(**extra))
