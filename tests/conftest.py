"""Test session setup: run JAX on a virtual 8-device CPU mesh.

Must run before the first `import jax` anywhere in the test session so the
XLA flags take effect. Multi-chip sharding tests use these 8 virtual devices;
the real TPU path is exercised by bench.py / __graft_entry__.py instead.
"""

import os

xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

# The axon TPU plugin may pre-import jax from sitecustomize with
# JAX_PLATFORMS=axon already latched; the config update below wins either way.
import jax

jax.config.update("jax_platforms", "cpu")

import pathlib
import sys

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

# persistent compile cache: repeated suite runs skip recompilation
from flashvtg_tpu.utils.runtime import enable_compilation_cache  # noqa: E402

enable_compilation_cache(os.path.expanduser("~/.cache/flashvtg_tpu_xla_cpu"))

REFERENCE_ROOT = pathlib.Path("/root/reference")


def reference_available() -> bool:
    return REFERENCE_ROOT.exists()
