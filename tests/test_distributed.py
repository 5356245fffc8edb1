"""Multi-host runtime helpers on the virtual CPU mesh."""

from hash_join_codes_knl_tpu.parallel.distributed import (
    data_mesh,
    initialize,
    liveness_check,
)


def test_initialize_single_host_noop():
    initialize()  # must not raise


def test_data_mesh_and_liveness():
    mesh = data_mesh()
    assert mesh.devices.size == 8
    assert liveness_check(mesh, timeout_s=60.0)
    mesh4 = data_mesh(4)
    assert mesh4.devices.size == 4
    assert liveness_check(mesh4, timeout_s=60.0)


def test_liveness_timeout_path():
    """A hanging heartbeat collective (dead participant) must return
    False within the deadline instead of blocking forever."""
    import time

    from hash_join_codes_knl_tpu.parallel.distributed import (
        data_mesh,
        liveness_check,
    )

    mesh = data_mesh(8)

    def hangs(x):
        time.sleep(3600)

    t0 = time.monotonic()
    assert liveness_check(mesh, timeout_s=0.5, _beat_fn=hangs) is False
    assert time.monotonic() - t0 < 5


def test_drivers_abort_on_dead_mesh(monkeypatch):
    """The distributed drivers call the liveness guard at their stage
    boundary and abort-with-diagnosis instead of entering the exchange."""
    import numpy as np
    import pytest

    import hash_join_codes_knl_tpu.parallel.distributed as dist
    from hash_join_codes_knl_tpu.parallel.cpra import cpra_join
    from hash_join_codes_knl_tpu.parallel.npj_dist import npj_join_dist

    monkeypatch.setattr(dist, "liveness_check", lambda *a, **k: False)
    mesh = dist.data_mesh(4)
    ik = np.arange(1, 257, dtype=np.uint32)
    iv = ik * np.uint32(3)
    with pytest.raises(RuntimeError, match="liveness"):
        cpra_join(ik, iv, ik, iv, mesh)
    with pytest.raises(RuntimeError, match="liveness"):
        npj_join_dist(ik, iv, ik, iv, mesh)
