"""Probe raw MXU throughput for the matmul shapes the tree sweep could
use, on the real chip.  Informs the kernel redesign: the Felsenstein
propagation per op is span x K x TB with span=16 — tiny against the
128x128 systolic array — so orientation/packing decides the ceiling.

Each variant runs NREP dependent matmuls inside one Pallas kernel (a
fori_loop with rotating operand buffers and an f32 accumulator so nothing
folds away), wrapped in a chained scan for trustworthy timing through the
axon tunnel.

Usage: python tools/mxu_probe.py [TB]
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TB = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
NREP = 512
NBUF = 4


def make_probe(m, k, n, transposed):
    """transposed=False: P[m,k] @ C[k,n=TB] -> [m,TB]
       transposed=True:  C[m=TB,k] @ P[k,n] -> [TB,n]"""

    UNROLL = 32

    def kernel(p_ref, c_ref, out_ref, acc):
        dn = (((1,), (0,)), ((), ()))

        def one(j):
            buf = c_ref[j % NBUF]
            if transposed:
                return jax.lax.dot_general(
                    buf, p_ref[...], dn,
                    preferred_element_type=jnp.float32)
            return jax.lax.dot_general(
                p_ref[...], buf, dn, preferred_element_type=jnp.float32)

        def body(i, _):
            # UNROLLED: a dynamic loop serializes on per-iteration syncs
            # (~6us/dot measured); unrolling with NBUF accumulator slots
            # exposes the pipelined MXU throughput the real kernel sees
            for j in range(UNROLL):
                acc[j % NBUF] += one(j)
            return 0

        acc[...] = jnp.zeros_like(acc)
        jax.lax.fori_loop(0, NREP // UNROLL, body, 0)
        out_ref[...] = acc[0]

    if transposed:
        c_shape = (NBUF, m, k)
        out_shape = (m, n)
    else:
        c_shape = (NBUF, k, n)
        out_shape = (m, n)
    p_shape = (k, n) if transposed else (m, k)

    @jax.jit
    def run(p, c):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(out_shape, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                      pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((NBUF,) + out_shape, jnp.float32)],
        )(p, c)

    p = jnp.asarray(np.random.default_rng(0).normal(size=p_shape),
                    jnp.bfloat16)
    c = jnp.asarray(np.random.default_rng(1).normal(size=c_shape),
                    jnp.bfloat16)
    return run, p, c


def time_variant(name, m, k, n, transposed, ops_per_mm):
    try:
        run, p, c = make_probe(m, k, n, transposed)

        @jax.jit
        def chain(x):
            def body(carry, _):
                y = run(p * carry, c)
                return y.reshape(-1)[0].astype(jnp.bfloat16) * 0 + 1, None
            last, _ = jax.lax.scan(body, x, None, length=8)
            return last

        jax.block_until_ready(chain(jnp.bfloat16(1.0)))
        dt = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.block_until_ready(chain(jnp.bfloat16(1.0)))
            dt = min(dt, (time.perf_counter() - t0) / 8)
        per_mm = dt / NREP
        sites = TB * ops_per_mm
        print(f"{name:32s} {per_mm * 1e6:8.2f} us/mm  "
              f"{per_mm / sites * 1e12:8.2f} ps/site-op  "
              f"{sites / per_mm:.3e} siteops/s", flush=True)
    except Exception as exc:  # noqa: BLE001
        print(f"{name:32s} FAIL {type(exc).__name__}: {str(exc)[:90]}",
              flush=True)


def main():
    print(f"backend={jax.default_backend()} TB={TB} NREP={NREP}",
          flush=True)
    time_variant("A cur    [16,96]@[96,TB]", 16, 96, TB, False, 1)
    time_variant("B transp [TB,96]@[96,16]", TB, 96, 16, True, 1)
    time_variant("C packed [128,768]@[768,TB]", 128, 768, TB, False, 8)
    time_variant("D high   [16,48]@[48,TB]", 16, 48, TB, False, 1)
    time_variant("E fast   [16,16]@[16,TB]", 16, 16, TB, False, 1)
    time_variant("F transp [TB,16]@[16,16]", TB, 16, 16, True, 1)
    time_variant("G full   [128,128]@[128,TB]", 128, 128, TB, False, 1)
    time_variant("H pack2  [32,192]@[192,TB]", 32, 192, TB, False, 2)
    time_variant("I pack4  [64,384]@[384,TB]", 64, 384, TB, False, 4)
    time_variant("J transp [TB,128]@[128,128]", TB, 128, 128, True, 1)


if __name__ == "__main__":
    main()
