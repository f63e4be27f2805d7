"""Shared bootstrap for the runnable examples.

Examples default to the CPU/float64 parity path (matching the printed
precision of the reference's examples/); set EXAMPLES_TPU=1 to run on
the TPU backend instead.
"""
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

# Persistent compilation cache — also on TPU: the round-3 Pallas
# cache-miss hang through the axon tunnel is no longer reproducible
# (tools/cacheprobe.py), and warm starts load the static kernel in ~2 s
# instead of a ~45 s cold compile.
jax.config.update("jax_compilation_cache_dir",
                  str(pathlib.Path(__file__).resolve().parent.parent
                      / ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

if os.environ.get("EXAMPLES_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
