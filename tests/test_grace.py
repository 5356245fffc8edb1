"""Grace join (engine/grace.py): out-of-core BUILD + probe sides vs the
oracle -- partition pass streamed in chunks, per-partition merge joins."""

import numpy as np
import pytest

from hash_join_codes_knl_tpu.engine.grace import grace_join
from hash_join_codes_knl_tpu.engine.oracle import join_oracle, multiset_digest


@pytest.fixture()
def workload():
    rng = np.random.default_rng(53)
    ik = np.unique(rng.integers(1, 2**32, 6000, dtype=np.uint32))[:4096]
    iv = rng.integers(0, 2**32, 4096, dtype=np.uint32)
    hits = ik[rng.integers(0, 4096, 18000)]
    miss = rng.integers(1, 2**32, 3000, dtype=np.uint32)
    ok = np.concatenate([hits, miss]).astype(np.uint32)
    rng.shuffle(ok)
    ov = rng.integers(0, 2**32, len(ok), dtype=np.uint32)
    return ik, iv, ok, ov


def test_grace_join_matches_oracle(tmp_path, workload):
    """Multi-chunk partition pass (both sides stream through the radix
    pass in 5000-row chunks), 8 partitions, rows collected through
    on_partition must reproduce the oracle multiset exactly."""
    ik, iv, ok, ov = workload
    rows = []

    def collect(meta, res, raw_pk):
        mc = np.asarray(res.match_cnts)
        m = mc == 1
        rows.append((raw_pk[m], np.asarray(res.probe_vals)[m],
                     np.asarray(res.match_vals)[m]))

    gres = grace_join(ik, iv, ok, ov, f_bits=3, chunk_rows=5000,
                      spill_dir=str(tmp_path / "g"), on_partition=collect)
    want = join_oracle(ik, iv, ok, ov)
    assert gres.join_tuples == len(want[0])
    assert sum(m.build_rows for m in gres.partitions) == len(ik)
    assert sum(m.probe_rows for m in gres.partitions) == len(ok)
    got = multiset_digest(*(np.concatenate(c) for c in zip(*rows)))
    assert got == multiset_digest(*want)


def test_grace_join_duplicate_build_keys(tmp_path, workload):
    """M:N cardinality is exact through the partitioned path."""
    ik, iv, ok, ov = workload
    dup_k = np.concatenate([ik, ik[:512]]).astype(np.uint32)
    dup_v = np.concatenate([iv, iv[:512] ^ 1]).astype(np.uint32)
    gres = grace_join(dup_k, dup_v, ok, ov, f_bits=2, chunk_rows=7000,
                      spill_dir=str(tmp_path / "g2"))
    want = join_oracle(dup_k, dup_v, ok, ov)
    assert gres.join_tuples == len(want[0])


def test_grace_chunk_rows_guard(tmp_path, workload):
    """chunk_rows <= 0 must raise, not spin forever in the phase-1
    stream (the distributed driver already guarded this)."""
    ik, iv, ok, ov = workload
    with pytest.raises(ValueError, match="chunk_rows"):
        grace_join(ik, iv, ok, ov, f_bits=3, chunk_rows=0,
                   spill_dir=str(tmp_path / "gz"))


def test_exact_join_tuples_above_u32():
    """Per-partition counts must not wrap at 2^32 output rows: the
    float32-corrected device sum recovers the exact total (overflow-as-
    value discipline -- a silently wrapped count is corruption)."""
    import jax.numpy as jnp

    from hash_join_codes_knl_tpu.engine.grace import _exact_join_tuples
    from hash_join_codes_knl_tpu.engine.phj import JoinResult

    n = 2_000_000
    cnts = np.full(n, 2400, np.uint32)  # sum = 4.8e9 > 2^32
    cnts[: n // 2] ^= 7  # non-constant, exercises float rounding
    want = int(cnts.astype(np.int64).sum())
    z = jnp.zeros(n, jnp.uint32)
    res = JoinResult(z, z, z, jnp.asarray(cnts), jnp.zeros(2, jnp.int32))
    assert want > 2**32 and int(res.join_tuples) != want  # u32 wraps
    assert _exact_join_tuples(res) == want


def test_grace_partition_budget_guard(tmp_path, workload):
    """A partition larger than the per-partition budget must raise with
    re-plan guidance (recursive split = larger f_bits), never OOM the
    chip silently."""
    ik, iv, ok, ov = workload
    with pytest.raises(RuntimeError, match="f_bits"):
        grace_join(ik, iv, ok, ov, f_bits=2, chunk_rows=8000,
                   spill_dir=str(tmp_path / "g3"),
                   partition_budget_rows=100)


def test_grace_cli_driver(tmp_path):
    """cli phj --grace-bits end to end with cardinality verification."""
    import io
    import json
    from contextlib import redirect_stdout

    from hash_join_codes_knl_tpu.cli import main

    args = ["phj", "1", "8192", "2048", "--seed", "19",
            "--dir", str(tmp_path), "--grace-bits", "2",
            "--stream-chunk-rows", "4096",
            "--spill-dir", str(tmp_path / "spill"), "--json"]
    buf = io.StringIO()
    with redirect_stdout(buf):
        assert main(args) == 0
    m = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert m["algorithm"] == "phj-grace"
    assert m["partitions"] == 4
    assert m["join_tuples"] == 8192


def test_grace_phase1_reuse(tmp_path, workload):
    """A rerun over identical inputs + routing reuses the phase-1
    partition files (no re-streaming); changed routing recomputes."""
    ik, iv, ok, ov = workload
    d = str(tmp_path / "g4")
    r1 = grace_join(ik, iv, ok, ov, f_bits=2, chunk_rows=8000, spill_dir=d)
    assert r1.reused_sides == {"build": False, "probe": False}
    r2 = grace_join(ik, iv, ok, ov, f_bits=2, chunk_rows=8000, spill_dir=d)
    assert r2.reused_sides == {"build": True, "probe": True}
    assert r2.join_tuples == r1.join_tuples
    # a different chunk size only permutes rows within partition files:
    # the fingerprint ignores it and the spill still reuses
    r3 = grace_join(ik, iv, ok, ov, f_bits=2, chunk_rows=5000, spill_dir=d)
    assert r3.reused_sides == {"build": True, "probe": True}
    # different routing (fanout) must NOT reuse
    r4 = grace_join(ik, iv, ok, ov, f_bits=3, chunk_rows=8000, spill_dir=d)
    assert r4.reused_sides == {"build": False, "probe": False}
    assert r4.join_tuples == r1.join_tuples


def test_grace_phase2_resume(tmp_path, workload):
    """A crash during phase 2 resumes from the progress journal: only
    unjournaled partitions re-join.  A row consumer disables resume
    (every partition must flow through on_partition)."""
    from hash_join_codes_knl_tpu.engine.grace import _journal_path

    ik, iv, ok, ov = workload
    d = str(tmp_path / "g6")
    r1 = grace_join(ik, iv, ok, ov, f_bits=2, chunk_rows=8000, spill_dir=d)
    n_live = sum(1 for m in r1.partitions if m.build_rows and m.probe_rows)
    assert r1.resumed_partitions == 0
    # full journal: a counts-only rerun joins nothing
    r2 = grace_join(ik, iv, ok, ov, f_bits=2, chunk_rows=8000, spill_dir=d)
    assert r2.resumed_partitions == n_live
    assert r2.join_tuples == r1.join_tuples
    # simulate a crash after the first partition: truncate the journal
    # to header + one record (a torn third line must also be ignored)
    lines = open(_journal_path(d)).read().splitlines()
    with open(_journal_path(d), "w") as f:
        f.write("\n".join(lines[:2]) + "\n" + lines[2][: len(lines[2]) // 2])
    r3 = grace_join(ik, iv, ok, ov, f_bits=2, chunk_rows=8000, spill_dir=d)
    assert r3.resumed_partitions == 1
    assert r3.join_tuples == r1.join_tuples
    # a row consumer must see EVERY live partition despite the journal
    seen = []
    r4 = grace_join(ik, iv, ok, ov, f_bits=2, chunk_rows=8000, spill_dir=d,
                    on_partition=lambda m, res, pk: seen.append(m.index))
    assert r4.resumed_partitions == 0
    assert len(seen) == n_live
    assert r4.join_tuples == r1.join_tuples


def test_grace_changed_values_not_reused(tmp_path, workload):
    """Same keys + NEW payload values: neither the phase-1 spill nor the
    phase-2 journal may resume (stale value files would join wrong
    payloads with the right cardinality -- checksums alone can't catch
    it downstream because the counts still match)."""
    ik, iv, ok, ov = workload
    d = str(tmp_path / "g7")
    r1 = grace_join(ik, iv, ok, ov, f_bits=2, chunk_rows=8000, spill_dir=d)
    rows = []

    def collect(meta, res, raw_pk):
        mc = np.asarray(res.match_cnts)
        m = mc == 1
        rows.append((raw_pk[m], np.asarray(res.probe_vals)[m],
                     np.asarray(res.match_vals)[m]))

    iv2 = (iv ^ np.uint32(0x5A5A5A5A)).astype(np.uint32)
    r2 = grace_join(ik, iv2, ok, ov, f_bits=2, chunk_rows=8000,
                    spill_dir=d, on_partition=collect)
    # build payloads changed -> build must re-partition; the untouched
    # probe side reuses its spill (that IS still valid)
    assert r2.reused_sides == {"build": False, "probe": True}
    assert r2.resumed_partitions == 0  # journal fp changed with the side
    assert r2.join_tuples == r1.join_tuples
    want = join_oracle(ik, iv2, ok, ov)
    got = multiset_digest(*(np.concatenate(c) for c in zip(*rows)))
    assert got == multiset_digest(*want)


def test_grace_corrupt_spill_recomputes(tmp_path, workload):
    """Silent on-disk corruption of a reused partition file is caught by
    the load-time checksum and recomputes that side's pass instead of
    joining garbage."""
    import os

    ik, iv, ok, ov = workload
    d = str(tmp_path / "g5")
    r1 = grace_join(ik, iv, ok, ov, f_bits=2, chunk_rows=8000, spill_dir=d)
    # flip one word of a nonempty probe partition's key file (size kept)
    victim = next(
        os.path.join(d, f"probe_{m.index}_hk.bin")
        for m in r1.partitions if m.probe_rows and m.build_rows
    )
    raw = bytearray(open(victim, "rb").read())
    raw[0] ^= 0xFF
    open(victim, "wb").write(bytes(raw))
    # a counts-only rerun with a complete journal never reads the file:
    # corruption is invisible AND harmless (counts come from the journal)
    r2 = grace_join(ik, iv, ok, ov, f_bits=2, chunk_rows=8000, spill_dir=d)
    assert r2.reused_sides == {"build": True, "probe": True}
    assert r2.join_tuples == r1.join_tuples
    # a run that must READ the partitions (row consumer disables journal
    # resume) hits the checksum and recomputes the probe side's pass
    r3 = grace_join(ik, iv, ok, ov, f_bits=2, chunk_rows=8000, spill_dir=d,
                    on_partition=lambda m, res, pk: None)
    assert r3.reused_sides["probe"] is False  # recomputed after checksum
    assert r3.reused_sides["build"] is True
    assert r3.join_tuples == r1.join_tuples


def test_grace_hot_key_chunk_host_fallback(tmp_path):
    """A chunk dominated by ONE hot key exceeds the device pass's
    per-tile run bound at any capacity (cap retries cannot converge);
    the driver must fall back to the exact host split for that chunk
    and still produce the exact join (regression: it raised after
    burning all cap retries)."""
    rng = np.random.default_rng(77)
    ik = np.unique(rng.integers(1, 2**32, 3000, dtype=np.uint32))[:2048]
    iv = rng.integers(0, 2**32, 2048, dtype=np.uint32)
    ok = ik[rng.integers(0, 2048, 20000)].astype(np.uint32)
    ok[:12000] = ik[5]  # 60% of probes are one key
    ov = rng.integers(0, 2**32, len(ok), dtype=np.uint32)
    gres = grace_join(ik, iv, ok, ov, f_bits=4, chunk_rows=4000,
                      spill_dir=str(tmp_path / "hot"))
    want = join_oracle(ik, iv, ok, ov)
    assert gres.join_tuples == len(want[0])
