import os

# Force the CPU backend with a virtual 8-device mesh for sharding tests,
# and x64 for the exact-precision model path.  Must run before jax inits.
# The env var alone is NOT enough on dev machines with a tunneled TPU:
# their sitecustomize registers the accelerator plugin at interpreter
# startup and overrides JAX_PLATFORMS, silently moving the whole suite
# onto the accelerator — the config API below wins over that.
# SNIPER_TEST_PLATFORM overrides (e.g. "axon" to run the suite on TPU).
_platform = os.environ.get("SNIPER_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
# The suite's fixtures are tiny; without this the latency-aware
# whole-file dispatch would route every "fast" run host-side and the
# device/slab paths would go untested (tests of the threshold itself
# override it back).
os.environ.setdefault("SNIPER_DEVICE_MIN_COLS", "0")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", _platform)
jax.config.update("jax_enable_x64", True)

from pathlib import Path  # noqa: E402

import pytest  # noqa: E402

DATA = Path(__file__).resolve().parent / "data"


@pytest.fixture(scope="session")
def data_dir() -> Path:
    return DATA
