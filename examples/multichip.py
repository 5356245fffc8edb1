"""Multi-chip joins over a device mesh (CPRA exchange + local joins).

On a single-device box this forces an 8-virtual-device CPU mesh so the
full distributed path (owner all_to_all, per-chip joins, skew
handling) executes; on a real slice drop the forcing block.

python examples/multichip.py
"""

import os

if True:  # virtual mesh for single-device boxes; remove on a real slice
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")

import numpy as np

import hash_join_codes_knl_tpu as hjk


def main():
    mesh = hjk.data_mesh(8)
    rng = np.random.default_rng(11)
    ni, no = 8192, 131072
    ik = np.unique(rng.integers(1, 2**32, ni * 2, dtype=np.uint32))[:ni]
    iv = rng.integers(0, 2**32, ni, dtype=np.uint32)
    ok = ik[rng.integers(0, ni, no)].astype(np.uint32)
    ov = rng.integers(0, 2**32, no, dtype=np.uint32)

    # the owner exchange routes tuples by hash; each chip joins its share
    res, plan = hjk.cpra_join(ik, iv, ok, ov, mesh)
    total = int(np.asarray(res.join_tuples).sum())
    print(f"cpra_join over {mesh.shape}: {total} tuples")

    # tier-ratio placement (the reference's DDR/MCDRAM split as a
    # device-group policy): 75% of traffic to one mesh half
    res_t, _ = hjk.cpra_join(ik, iv, ok, ov, mesh, slack=4.0,
                             tier_ratio=0.75)
    assert int(np.asarray(res_t.join_tuples).sum()) == total
    print("tier-ratio run matches")

    # skewed probe side: heavy-hitter replication handles it
    ok_skew = ok.copy()
    ok_skew[: no // 4] = ik[0]
    light, heavy, _ = hjk.cpra_join(ik, iv, ok_skew, ov, mesh, skew=True)
    total_skew = int(np.asarray(light.join_tuples).sum()) + int(
        np.asarray(heavy[3]).astype(np.int64).sum())
    print(f"skewed join (heavy-hitter replication): {total_skew} tuples")


if __name__ == "__main__":
    main()
