"""Multi-PROCESS distributed Grace join: 2 simulated hosts x 4 CPU
devices each (jax.distributed local cluster).

This exercises exactly the host-side code the pre-r5 single-controller
guard excluded: per-host fragment extraction from addressable shards,
per-host spill dirs/sidecars/journals, cross-host count/total
reconciliation (u32-lane allgather sums), and the lockstep
resume-agreement rules.  Reference: the cross-thread repository gather
at the heart of CPRA (/root/reference/cpra2.cpp:1875-1906), here as an
owner all_to_all whose receiving hosts each keep only their devices'
partitions.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from hash_join_codes_knl_tpu.engine.oracle import join_oracle, multiset_digest

_WORKER = os.path.join(os.path.dirname(__file__), "mp_grace_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_workers(port, data_dir, spill_root, with_consumer, nprocs=2):
    env = dict(os.environ)
    # the workers set their own XLA_FLAGS/platform; strip pytest's
    env.pop("JAX_PLATFORMS", None)
    root = os.path.join(os.path.dirname(__file__), "..")
    env["PYTHONPATH"] = root + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, _WORKER, str(i), str(nprocs), str(port),
             data_dir, spill_root, "1" if with_consumer else "0"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(nprocs)
    ]
    results = {}
    for i, p in enumerate(procs):
        out, err = p.communicate(timeout=900)
        assert p.returncode == 0, f"worker {i} failed:\n{err[-3000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT ")]
        assert line, f"worker {i} printed no RESULT:\n{out[-1000:]}"
        results[i] = json.loads(line[-1][len("RESULT "):])
    return results


@pytest.fixture(scope="module")
def workload(tmp_path_factory):
    d = tmp_path_factory.mktemp("mpdata")
    rng = np.random.default_rng(83)
    ik = np.unique(rng.integers(1, 2**32, 6000, dtype=np.uint32))[:4096]
    iv = rng.integers(0, 2**32, 4096, dtype=np.uint32)
    hits = ik[rng.integers(0, 4096, 14000)]
    miss = rng.integers(1, 2**32, 3000, dtype=np.uint32)
    ok = np.concatenate([hits, miss]).astype(np.uint32)
    rng.shuffle(ok)
    ov = rng.integers(0, 2**32, len(ok), dtype=np.uint32)
    for name, a in (("ik", ik), ("iv", iv), ("ok", ok), ("ov", ov)):
        np.save(os.path.join(str(d), f"{name}.npy"), a)
    return str(d), (ik, iv, ok, ov)


def test_grace_dist_two_process_cpu_mesh(tmp_path, workload):
    """2 processes x 4 devices: totals global + identical on both
    hosts, host-local row digests combine (additively) to the oracle
    multiset, and each partition's rows surface on exactly one host."""
    data_dir, (ik, iv, ok, ov) = workload
    spill = str(tmp_path / "mp_spill")
    results = _run_workers(_free_port(), data_dir, spill,
                           with_consumer=True)
    want = join_oracle(ik, iv, ok, ov)
    wc, ws1, ws2 = multiset_digest(*want)
    totals = {r["total"] for r in results.values()}
    assert totals == {len(want[0])}, totals
    # per-host digests are over disjoint partitions: components sum
    c = sum(r["digest"][0] for r in results.values())
    s1 = sum(r["digest"][1] for r in results.values()) % (1 << 64)
    s2 = sum(r["digest"][2] for r in results.values()) % (1 << 64)
    assert (c, s1, s2) == (wc, ws1, ws2)
    # ownership is disjoint and every worked partition fired somewhere
    seen0 = set(results[0]["parts_seen"])
    seen1 = set(results[1]["parts_seen"])
    assert not (seen0 & seen1)
    # global per-partition counts agree across hosts
    assert results[0]["meta_counts"] == results[1]["meta_counts"]
    # per-host spill dirs both materialized
    assert os.path.isdir(os.path.join(spill, "host0"))
    assert os.path.isdir(os.path.join(spill, "host1"))


def test_grace_dist_two_process_resume(tmp_path, workload):
    """A counts-only rerun over the same per-host spills resumes BOTH
    phases on every host: phase-1 files reuse (checksum-verified
    sidecars) and phase-2 journals replay, with the same global total."""
    data_dir, (ik, iv, ok, ov) = workload
    spill = str(tmp_path / "mp_spill_resume")
    first = _run_workers(_free_port(), data_dir, spill,
                         with_consumer=False)
    want_total = len(join_oracle(ik, iv, ok, ov)[0])
    assert {r["total"] for r in first.values()} == {want_total}
    assert all(not any(r["reused"].values()) for r in first.values())
    second = _run_workers(_free_port(), data_dir, spill,
                          with_consumer=False)
    assert {r["total"] for r in second.values()} == {want_total}
    for r in second.values():
        assert r["reused"] == {"build": True, "probe": True}
        assert r["resumed"] > 0
    assert (second[0]["meta_counts"] == second[1]["meta_counts"]
            == first[0]["meta_counts"])
