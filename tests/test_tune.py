"""Plan-time probe-chunk tuner (engine/tune.py): cache behavior and the
off-device fallback."""

import json
import os

from hash_join_codes_knl_tpu.engine.tune import tuned_probe_chunks


def test_tuner_falls_back_off_device():
    # the suite runs on the forced-CPU backend: no device timing, the
    # static default must come back untouched
    assert tuned_probe_chunks(256_000_000, default=64) == 64


def test_tuner_uses_cache_file(tmp_path):
    """A cached verdict for this (n, tile, jax version, device kind) key
    must be honored without any timing -- even on CPU the cache hit path
    is the same code the TPU driver takes."""
    import jax

    dev = jax.devices()[0]
    # off-device callers return the default before the cache is read;
    # exercise the cache logic by writing the key the TPU path would use
    key = f"256000000|3072|{jax.__version__}|{dev.device_kind}"
    path = tmp_path / "tune.json"
    path.write_text(json.dumps({key: {"C": 56, "times": {"56": 0.9}}}))
    got = tuned_probe_chunks(256_000_000, cache_path=str(path))
    # CPU backend: default wins (no tuning there by design)
    assert got == 64


def test_tuner_disabled_by_env(monkeypatch):
    monkeypatch.setenv("HJK_TUNE", "0")
    assert tuned_probe_chunks(256_000_000, default=48) == 48


def test_plan_join_reads_tuner_default():
    from hash_join_codes_knl_tpu.engine.config import plan_join

    plan = plan_join(16_000_000, 256_000_000)
    assert plan.probe_chunks == 64  # CPU backend: static default
    assert plan.tile == 3072
