"""Isolate the Pallas persistent-compilation-cache hang (ROADMAP #3).

Round-3 observation: with jax_compilation_cache_dir set, a cache-MISS
compile of any program containing a Pallas custom call hangs indefinitely
through the axon remote-compile tunnel; warm loads work.  This probe
times each stage with hard timeouts so the hang point is visible:

  stage 1: pure-XLA jit with cache enabled        (expected: fine)
  stage 2: trivial Pallas kernel, cache DISABLED  (expected: fine)
  stage 3: trivial Pallas kernel, cache ENABLED, cold dir
  stage 4: same program again in a subprocess     (warm-load check)

Usage: python tools/cacheprobe.py [stage]   (default: run 1-3 inline)
Each stage runs in a subprocess with a timeout so a hang is reported,
not suffered.
"""
from __future__ import annotations

import os
import subprocess
import sys
import tempfile
import time

STAGE_SRC = r"""
import sys, time
import jax, jax.numpy as jnp
import numpy as np

stage = sys.argv[1]
cache_dir = sys.argv[2] if len(sys.argv) > 2 else ""
if cache_dir:
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

t0 = time.time()
if stage == "xla":
    f = jax.jit(lambda x: jnp.sin(x) @ x.T)
    r = f(jnp.ones((256, 256), jnp.float32))
else:
    from jax.experimental import pallas as pl

    def kern(x_ref, o_ref):
        o_ref[...] = x_ref[...] * 2.0 + 1.0

    def f(x):
        return pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype))(x)

    r = jax.jit(f)(jnp.ones((256, 256), jnp.float32))
jax.block_until_ready(r)
print(f"OK {stage} compile+run {time.time()-t0:.1f}s", flush=True)
"""


def run_stage(stage: str, cache_dir: str, timeout: int = 240) -> str:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(STAGE_SRC)
        path = f.name
    t0 = time.time()
    try:
        out = subprocess.run([sys.executable, path, stage, cache_dir],
                             capture_output=True, text=True,
                             timeout=timeout)
        tail = [ln for ln in out.stdout.splitlines() if ln.strip()]
        return (f"{stage:22s} rc={out.returncode} {time.time()-t0:6.1f}s  "
                + (tail[-1] if tail else out.stderr.splitlines()[-1:]
                   and out.stderr.splitlines()[-1][:120] or ""))
    except subprocess.TimeoutExpired:
        return f"{stage:22s} HANG (>{timeout}s)"
    finally:
        os.unlink(path)


def main():
    cache = tempfile.mkdtemp(prefix="jaxcacheprobe_")
    print(f"cache dir: {cache}")
    print(run_stage("xla", cache))
    print(run_stage("pallas-nocache", ""))
    print(run_stage("pallas-cold", cache))
    print(run_stage("pallas-warm", cache))


if __name__ == "__main__":
    main()
