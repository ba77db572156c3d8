"""Test configuration: run the whole suite on a virtual 8-device CPU mesh.

XLA flags must be set before jax initializes (SURVEY.md §4 item 4).  On
this image a sitecustomize on PYTHONPATH registers a TPU ("axon") PJRT
backend at *interpreter startup*, before conftest runs — setting env
vars here is too late.  When that happens we re-exec pytest once with a
scrubbed environment so the suite runs on the 8-device CPU mesh it was
written for (TPU execution is exercised by bench.py, not the unit
suite).
"""

import os
import sys

_WANT_ENV = {
    "JAX_PLATFORMS": "cpu",
    "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
    "PYTHONPATH": "",  # drop the sitecustomize that force-registers the TPU
    "JAX_ENABLE_X64": "0",
}


def _needs_reexec() -> bool:
    if os.environ.get("_POPUP_SLAM_TEST_REEXEC") == "1":
        return False
    if os.environ.get("JAX_PLATFORMS", "cpu") != "cpu":
        return True
    if "jax" in sys.modules:
        import jax

        try:
            return jax.devices()[0].platform != "cpu"
        except Exception:
            return True
    return False


if _needs_reexec():
    import subprocess

    env = dict(os.environ)
    env.update(_WANT_ENV)
    env["_POPUP_SLAM_TEST_REEXEC"] = "1"
    # subprocess (not os.execve): execve can detach stdout from the
    # parent's capture pipe in sandboxed environments, losing all
    # pytest output while still reporting the right exit code.
    ret = subprocess.run(
        [sys.executable, "-m", "pytest", *sys.argv[1:]], env=env
    )
    os._exit(ret.returncode)

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# Persistent XLA compilation cache: fresh jit compiles cost 10-60 s on
# this box and dominate suite wall-clock; cached across test processes
# and sessions they are near-free.  Lives outside the repo tree.
jax.config.update("jax_compilation_cache_dir", "/tmp/popup_slam_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# SURVEY.md §4/§5: NaN checking on in the unit suite.  Opt out per-test
# with the `no_debug_nans` fixture for code paths that intentionally
# produce masked NaN/inf lanes (fixed-capacity padding idiom).
jax.config.update("jax_debug_nans", True)

import pytest  # noqa: E402


@pytest.fixture
def no_debug_nans():
    jax.config.update("jax_debug_nans", False)
    yield
    jax.config.update("jax_debug_nans", True)
