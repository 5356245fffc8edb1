"""Plan-time probe-chunk auto-tuner (NEXT.md #3).

The batched 2-D pair-sort cost surface over (chunk count, row length)
is ERRATIC and shifts across XLA releases (PERF_NOTES.md: (32, 8M) =
1.05 s yet (64, 4M) faster; a sharp cliff at C=64).  Hand-tuned
defaults therefore rot.  This module times the probe-side sort -- the
term that actually distinguishes chunk plans; the gather probe is
width-flat -- for a few candidate C values ON THE DEVICE at plan time,
picks the fastest, and caches the verdict per (outer rows, jax version,
device kind) in a JSON file, so the cost is paid once per geometry per
software/hardware combination.

Candidates stay within the proven window regime: C <= 72 keeps
tile-3072 window spans under the 121-chunk gather ceiling for uniform
densities (skewed workloads re-plan via the measured span as always).
Any failure (no device, OOM, interrupt) falls back to the static
default -- tuning is an optimization, never a correctness dependency.
"""

from __future__ import annotations

import json
import os

DEFAULT_CANDIDATES = (48, 56, 64, 72)
_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def _cache_path() -> str:
    return os.environ.get(
        "HJK_TUNE_CACHE", os.path.join(_REPO_ROOT, ".hjk_tune.json")
    )


def _load_cache(path: str) -> dict:
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, ValueError):
        return {}


def _time_sort(outer_n: int, C: int, tile: int, reps: int) -> float:
    """MIN seconds over `reps` runs of the batched (C, cap/C) pair sort
    at this geometry, on the default device, with a host-transfer fence
    per run (block_until_ready is not a fence through the axon tunnel).
    Min, not median: timing noise through the tunnel is one-sided
    positive (host hiccups only ever ADD time), and at the default
    reps=2 a median would actually be the max -- one hiccup on the
    truly-fastest candidate could flip the cached verdict permanently."""
    import time

    import jax
    import jax.numpy as jnp

    quantum = tile * C
    cap = -(-outer_n // quantum) * quantum
    rows = cap // C

    @jax.jit
    def make(seed):
        k = jax.random.bits(jax.random.key(seed), (C, rows), jnp.uint32)
        v = jax.random.bits(jax.random.key(seed + 1), (C, rows),
                            jnp.uint32)
        return k, v

    @jax.jit
    def run(k, v):
        ks, vs = jax.lax.sort((k, v), dimension=1, num_keys=1)
        return ks[0, 0] + vs[0, 0]

    k, v = make(0)
    float(run(k, v))  # compile + warm
    ts = []
    for r in range(1, reps + 1):
        k, v = make(r)
        float(k[0, 0])  # fence the data generation out of the timed region
        t0 = time.perf_counter()
        float(run(k, v))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def tuned_probe_chunks(
    outer_n: int,
    tile: int = 3072,
    default: int = 64,
    candidates=DEFAULT_CANDIDATES,
    reps: int = 2,
    cache_path: str | None = None,
) -> int:
    """The measured-best probe chunk count for this geometry (cached),
    or `default` when tuning is unavailable/disabled
    (HJK_TUNE=0 disables; off-device callers always get the default)."""
    if os.environ.get("HJK_TUNE", "1") == "0":
        return default
    if len(candidates) == 0:
        return default
    if len(candidates) == 1:
        return int(candidates[0])  # no choice to time
    try:
        import jax

        dev = jax.devices()[0]
        if dev.platform == "cpu":
            return default
        # the candidate set is part of the key: plan_join narrows
        # candidates by its window-feasibility cap, and a verdict timed
        # under a narrow cap must not be reused where more C values are
        # admissible (it would lock in an untimed choice)
        cset = ",".join(str(C) for C in candidates)
        key = (f"{outer_n}|{tile}|{cset}|{jax.__version__}|"
               f"{dev.device_kind}")
    except Exception:
        return default
    path = cache_path or _cache_path()
    cache = _load_cache(path)
    if key in cache:
        return int(cache[key]["C"])
    try:
        times = {}
        for C in candidates:
            times[str(C)] = round(_time_sort(outer_n, C, tile, reps), 4)
        best = int(min(times, key=lambda c: times[c]))
        # merge-on-write + atomic replace: a concurrent tuner (e.g. the
        # bench matrix running several geometries in parallel processes)
        # must neither read a torn half-written file nor have its own
        # fresh entry clobbered by this process's stale snapshot
        cache = _load_cache(path)
        cache[key] = {"C": best, "times": times}
        tmp = f"{path}.tmp.{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(cache, f, indent=1)
        os.replace(tmp, path)
        return best
    except Exception:
        return default
