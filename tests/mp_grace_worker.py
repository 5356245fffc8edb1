"""Worker process for the multi-process distributed-Grace test.

Launched by tests/test_grace_dist_mp.py, one per simulated host:
initializes jax.distributed against a local coordinator, builds a CPU
mesh over ALL processes' devices, runs grace_join_dist on the shared
workload, and prints one RESULT json line (host-local row digest +
global totals) for the parent to combine and verify.

argv: pid nprocs port data_dir spill_root with_consumer(0|1)
"""

import json
import os
import sys


def main():
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    data_dir, spill_root, with_consumer = (
        sys.argv[4], sys.argv[5], sys.argv[6] == "1"
    )
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=4"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nprocs, process_id=pid,
    )
    import numpy as np

    from hash_join_codes_knl_tpu.engine.oracle import multiset_digest
    from hash_join_codes_knl_tpu.parallel.grace_dist import grace_join_dist

    ik = np.load(os.path.join(data_dir, "ik.npy"))
    iv = np.load(os.path.join(data_dir, "iv.npy"))
    ok = np.load(os.path.join(data_dir, "ok.npy"))
    ov = np.load(os.path.join(data_dir, "ov.npy"))

    mesh = jax.make_mesh((len(jax.devices()),), ("x",))
    rows = []
    seen_parts = []

    def collect(meta, res, raw_pk):
        assert len(np.asarray(res.build_counts)) == 3
        mc = np.asarray(res.match_cnts)
        m = mc == 1
        seen_parts.append(meta.index)
        rows.append((raw_pk[m], np.asarray(res.probe_vals)[m],
                     np.asarray(res.match_vals)[m]))

    gres = grace_join_dist(
        ik, iv, ok, ov, mesh, f_bits=4, chunk_rows=1500,
        spill_dir=spill_root,
        on_partition=collect if with_consumer else None,
        liveness_timeout_s=60.0,
    )
    if rows:
        cat = [np.concatenate(c) for c in zip(*rows)]
    else:
        cat = [np.zeros(0, np.uint32)] * 3
    c, s1, s2 = multiset_digest(*cat)
    print("RESULT " + json.dumps({
        "pid": pid,
        "total": gres.join_tuples,
        "digest": [c, s1, s2],
        "reused": gres.reused_sides,
        "resumed": gres.resumed_partitions,
        "parts_seen": sorted(seen_parts),
        "meta_counts": [m.join_tuples for m in gres.partitions],
    }), flush=True)


if __name__ == "__main__":
    main()
