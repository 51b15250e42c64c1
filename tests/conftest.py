import os

import numpy as np
import pytest

# Persistent compilation cache: first run on real TPU pays the compile
# cost, reruns are fast.
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/qgtc_jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0")

# Run the suite on in-process CPU by default: per-op dispatch to the
# remote TPU is ~seconds, which makes a large suite unusable. Pallas
# kernels auto-select interpret mode off-TPU. Real-hardware validation
# lives in tests that re-exec on the device via run_on_tpu below. Set
# QGTC_TEST_BACKEND=tpu to force the whole suite onto the device.
# The axon sitecustomize initializes the TPU backend at interpreter
# start, so flipping the env var is not enough -- clear the backend
# registry and reselect.
if os.environ.get("QGTC_TEST_BACKEND", "cpu") == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax
    import jax.extend.backend

    jax.config.update("jax_platforms", "cpu")
    jax.extend.backend.clear_backends()


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(3)


def run_subprocess(code: str, env_overrides: dict, timeout: int = 600) -> str:
    """Run a python snippet in a fresh interpreter with env overrides.

    Used for (a) compiled-on-TPU validation tests, where the parent
    process runs on CPU, and (b) multi-device CPU-mesh tests, which
    need the axon sitecustomize disabled before interpreter start
    (PALLAS_AXON_POOL_IPS='') so virtual CPU devices can be created.
    """
    import subprocess
    import sys

    env = dict(os.environ)
    env.update(env_overrides)
    proc = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=timeout,
        env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    if proc.returncode != 0:
        raise AssertionError(
            f"subprocess failed (rc={proc.returncode})\n"
            f"--- stdout ---\n{proc.stdout}\n--- stderr ---\n{proc.stderr}"
        )
    return proc.stdout


def run_on_tpu(code: str, timeout: int = 600) -> str:
    """Run a snippet compiled on the real TPU (axon backend)."""
    return run_subprocess(
        code, {"JAX_PLATFORMS": "axon", "QGTC_TEST_BACKEND": "tpu"}, timeout
    )


def run_on_cpu_mesh(code: str, n_devices: int = 8, timeout: int = 600) -> str:
    """Run a snippet on a virtual multi-device CPU mesh."""
    return run_subprocess(
        code,
        {
            "JAX_PLATFORMS": "cpu",
            "PALLAS_AXON_POOL_IPS": "",
            "PYTHONPATH": os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "XLA_FLAGS": f"--xla_force_host_platform_device_count={n_devices}",
        },
        timeout,
    )
