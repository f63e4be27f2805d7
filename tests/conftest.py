"""Test configuration: CPU backend with 8 virtual devices, f64 enabled.

Parity tests run in float64 on CPU (the reference is f64 C); sharding tests
use the 8 virtual CPU devices as a stand-in mesh. TPU execution is exercised
by bench.py / __graft_entry__.py on real hardware.
"""
import os

# Force CPU: the session environment may point JAX at the TPU tunnel
# (JAX_PLATFORMS=axon); parity tests must run on CPU/f64.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin pins jax_platforms despite the env var; force CPU here.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: repeat suite runs skip XLA:CPU recompiles
# of the heavier programs (>1s compiles are cached).
import pathlib  # noqa: E402

jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).resolve().parent.parent
                      / ".jax_cache"))
