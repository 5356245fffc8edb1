"""Top-level package API surface: every flagship entry point importable
from the package root, lazily (no jax import until first access)."""

import subprocess
import sys


def test_top_level_exports_resolve():
    import hash_join_codes_knl_tpu as hjk

    for name in hjk.__all__:
        assert getattr(hjk, name) is not None, name
    assert "join" in dir(hjk) and "generate" in dir(hjk)


def test_package_import_is_lazy():
    """Importing the package root must not import any engine submodule
    (and hence no jax via the package itself -- this box's axon
    sitecustomize imports jax at interpreter start, so jax presence
    cannot be the signal)."""
    code = (
        "import sys, hash_join_codes_knl_tpu; "
        "subs = [m for m in sys.modules "
        "        if m.startswith('hash_join_codes_knl_tpu.')]; "
        "sys.exit(1 if subs else 0)"
    )
    assert subprocess.run([sys.executable, "-c", code]).returncode == 0


def test_unknown_attribute_raises():
    import pytest

    import hash_join_codes_knl_tpu as hjk

    with pytest.raises(AttributeError):
        hjk.nonexistent_thing
