"""Test configuration: run JAX on a virtual 8-device CPU mesh with float64.

Mirrors the reference's test posture: single-threaded (exact) runs use tight
tolerances, distribution is tested with multiple local "ranks" (here: virtual
CPU devices instead of `mpirun -n N`; reference tests/CMakeLists.txt:213-239).

The session environment loads an axon (TPU tunnel) PJRT plugin via
sitecustomize, which (a) initialises JAX backends at interpreter start —
locking the CPU device count to 1 before we can request 8 — and (b) leaves a
non-daemon relay that stalls interpreter exit by ~2 minutes.  Tests are
CPU-only, so pytest re-execs itself once with that hook stripped from the
environment (capture must be suspended first or the new process writes into
the dead capture fds).
"""

import os
import sys

_NEEDS_REEXEC = (
    os.environ.get("PALLAS_AXON_POOL_IPS")
    and os.environ.get("_BLASTED_TEST_REEXEC") != "1"
)


def pytest_configure(config):
    if _NEEDS_REEXEC:
        capman = config.pluginmanager.getplugin("capturemanager")
        if capman is not None:
            capman.suspend_global_capture(in_=True)
        env = dict(os.environ)
        env["_BLASTED_TEST_REEXEC"] = "1"
        env["JAX_PLATFORMS"] = "cpu"
        env["PYTHONPATH"] = ""  # drops the axon sitecustomize hook
        for k in ("PALLAS_AXON_POOL_IPS", "PALLAS_AXON_REMOTE_COMPILE"):
            env.pop(k, None)
        sys.stdout.flush()
        sys.stderr.flush()
        os.execve(sys.executable,
                  [sys.executable, "-m", "pytest"] + sys.argv[1:], env)


if not _NEEDS_REEXEC:
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax

    jax.config.update("jax_enable_x64", True)
    # must be set before any backend query initialises the CPU client
    if os.environ.get("JAX_PLATFORMS", "cpu") == "cpu":
        try:
            jax.config.update("jax_num_cpu_devices", 8)
        except Exception:
            pass

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(12345)
