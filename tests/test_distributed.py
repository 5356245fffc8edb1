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
