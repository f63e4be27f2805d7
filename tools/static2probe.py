"""Isolate the static2 (c-major) on-chip slowdown (ROADMAP #5).

static2 is exact but measures 50-1000x slower than the static kernel on
v5e.  Its inner loop differs from static in exactly two constructs:

  a) the P operand is a STATIC COLUMN GROUP of a dynamically-indexed row:
         pcm_ref[pm][:, offs[s]:offs[s+1]]
  b) the CLV operand is a PREFIX of the pool slab: slab[:span*(s+1)]
  c) there are `parts` dependent matmuls per child instead of one.

This probe times four minimal kernels over the same op count / shapes to
find which construct explodes:

  k0  one matmul per op, full-width operands            (static-like)
  k1  one matmul, P = full-width slice of a wider row   (isolates slicing)
  k2  three matmuls, static column groups, pm = 0       (no gather)
  k3  three matmuls, static column groups, gathered pm  (= static2)

Usage: python tools/static2probe.py [n_ops] [tb] [reps]
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

SPAN = 16          # R*S for DNA GAMMA4
P_ROWS = 64        # pmatrix slots


def make_kernel(variant: str, n_ops: int, parts: int = 3):
    offs = [SPAN * (s * (s + 1) // 2) for s in range(parts + 1)]
    dn = (((1,), (0,)), ((), ()))

    def kernel(pcm_ref, pool, out_ref):
        tb = out_ref.shape[-1]
        acc = jnp.zeros((SPAN, tb), jnp.float32)
        for w in range(n_ops):
            pm = (w * 7) % P_ROWS
            slot = w % 8
            if variant == "k0":
                d = jax.lax.dot_general(
                    pcm_ref[pm][:, :SPAN], pool[slot, :SPAN], dn,
                    preferred_element_type=jnp.float32)
            elif variant == "k1":
                d = jax.lax.dot_general(
                    pcm_ref[pm][:, :parts * SPAN],
                    pool[slot, :parts * SPAN], dn,
                    preferred_element_type=jnp.float32)
            elif variant in ("k2", "k3"):
                row = pcm_ref[0 if variant == "k2" else pm]
                d = None
                for s in range(parts):
                    pcols = row[:, offs[s]:offs[s + 1]]
                    t = jax.lax.dot_general(
                        pcols, pool[slot, :SPAN * (s + 1)], dn,
                        preferred_element_type=jnp.float32)
                    d = t if d is None else d + t
            acc = acc + d
        out_ref[...] = acc

    return kernel


def run(variant: str, n_ops: int, tb: int, reps: int) -> float:
    parts = 3
    cm = SPAN * (parts * (parts + 1) // 2)
    kernel = make_kernel(variant, n_ops)
    pcm = jnp.asarray(np.random.rand(P_ROWS, SPAN, cm), jnp.bfloat16)
    pool = jnp.asarray(np.random.rand(8, parts * SPAN, tb), jnp.bfloat16)

    @jax.jit
    def f(pcm, pool):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((SPAN, tb), jnp.float32),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
        )(pcm, pool)

    @jax.jit
    def chain(pcm, pool):
        def body(carry, _):
            r = f(pcm * (1.0 + carry * 0), pool)
            return jnp.max(r), None
        last, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return last

    t0 = time.time()
    jax.block_until_ready(chain(pcm, pool))
    tc = time.time() - t0
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(pcm, pool))
        best = min(best, (time.perf_counter() - t0) / reps)
    return tc, best


def main():
    n_ops = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    tb = int(sys.argv[2]) if len(sys.argv) > 2 else 2048
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    print(f"n_ops={n_ops} tb={tb} reps={reps}")
    for v in ("k0", "k1", "k2", "k3"):
        tc, t = run(v, n_ops, tb, reps)
        per_op = t / n_ops * 1e6
        print(f"{v}: compile {tc:5.1f}s  {t * 1e3:8.3f} ms/iter  "
              f"{per_op:7.2f} us/op", flush=True)


if __name__ == "__main__":
    main()
