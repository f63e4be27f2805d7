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

if os.environ.get("EXAMPLES_TPU") != "1":
    # Persistent compilation cache (CPU only: cache-miss compiles of
    # Pallas-bearing programs hang through the axon tunnel — bench.py)
    jax.config.update("jax_compilation_cache_dir",
                      str(pathlib.Path(__file__).resolve().parent.parent
                          / ".jax_cache"))

if os.environ.get("EXAMPLES_TPU") != "1":
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
