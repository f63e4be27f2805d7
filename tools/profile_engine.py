#!/usr/bin/env python
"""Per-phase profiling harness for the likelihood engine.

The reference's only performance facility is the wall-clock speed mode of
its golden-file harness (test/runtest.py speed).  This tool reports a
phase breakdown on the current JAX backend — P-matrix construction, CLV
sweep (each kernel path), logL reduction, derivatives — and can capture an
xprof/TensorBoard trace (jax.profiler) for kernel-level inspection.

Usage:
  python tools/profile_engine.py [--tips N] [--sites N] [--trace DIR]
"""
from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def chained(fn, arg, iters, *operands):
    """Data-dependent chained timing under one dispatch (see bench.py).

    Pass every large array in `operands` (fn receives them after its
    first argument): closed-over arrays embed as HLO constants and cost
    ~400s of extra cold compile through the remote-compile tunnel
    (tools/scanprobe.py)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(x, *ops):
        def body(carry, _):
            r = fn(x * (1.0 + 1e-12 * carry), *ops)
            return r, None
        last, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return last

    jax.block_until_ready(chain(arg, *operands))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(arg * 1.0000001, *operands))
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tips", type=int, default=256)
    ap.add_argument("--sites", type=int, default=65536)
    ap.add_argument("--rate-cats", type=int, default=4)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--trace", type=str, default=None,
                    help="capture a jax.profiler trace into this directory")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from libpll2_tpu import engine
    from libpll2_tpu import tree as T
    from libpll2_tpu.config import PartitionConfig
    from libpll2_tpu.models.gamma import compute_gamma_cats
    from libpll2_tpu.ops import pmatrix as pmatrix_ops
    from libpll2_tpu.tree.generate import balanced_newick, random_tipchars

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    tree = T.parse_newick_string(balanced_newick(args.tips))

    def build(**kw):
        cfg = PartitionConfig(
            tips=args.tips, clv_buffers=tree.inner_count, states=4,
            sites=args.sites, rate_matrices=1,
            prob_matrices=2 * args.tips - 3, rate_cats=args.rate_cats,
            scale_buffers=tree.inner_count, dtype=jnp.float32,
            site_block=128, **kw)
        return cfg, engine.compile_tree(tree, cfg)

    model = engine.make_model(
        [[1.0, 2.0, 1.0, 1.0, 2.0, 1.0]], [[0.25] * 4],
        compute_gamma_cats(1.0, args.rate_cats), dtype=jnp.float32)
    rng = np.random.default_rng(0)
    cfg0, _ = build()
    raw = random_tipchars(args.tips, args.sites, rng)
    tipchars = jnp.asarray(engine.pad_tipchars(raw, cfg0))
    pw = jnp.asarray(np.r_[np.ones(args.sites),
                           np.zeros(cfg0.sites_padded - args.sites)],
                     jnp.float32)
    inv = jnp.asarray(np.full(cfg0.sites_padded, -1, np.int32))

    rows = []

    # P-matrix phase alone
    def pmats_only(bl):
        p = pmatrix_ops.compute_pmatrices(
            bl, model.eigenvals, model.eigenvecs, model.inv_eigenvecs,
            model.rates, model.prop_invar, model.params_indices,
            dtype=jnp.float32)
        return p.sum()

    for label, kw in [("logL vmem-pallas", dict(use_pallas=True)),
                      ("logL streaming/XLA", dict(use_pallas=False))]:
        cfg, prog = build(**kw)
        bl0 = jnp.asarray(prog.default_branch_lengths, jnp.float32)

        def f(bl, tipchars, pw, inv, prog=prog, cfg=cfg):
            return engine.loglikelihood(prog, cfg, model, bl, tipchars,
                                        pw, inv)
        dt = chained(f, bl0, args.iters, tipchars, pw, inv)
        su = (args.tips - 2) * args.sites / dt
        rows.append((label, dt, su))

    cfg, prog = build()
    bl0 = jnp.asarray(prog.default_branch_lengths, jnp.float32)
    rows.append(("pmatrices only",
                 chained(pmats_only, bl0, args.iters), None))

    def train(bl, tipchars, pw, inv, prog=prog, cfg=cfg):
        new_bl, logl = engine.optimize_root_branch(
            prog, cfg, model, bl, tipchars, pw, inv)
        return logl
    rows.append(("logL + root-branch Newton",
                 chained(train, bl0, args.iters, tipchars, pw, inv), None))

    print(f"{'phase':28s} {'ms/call':>10s} {'site-updates/s':>16s}")
    for label, dt, su in rows:
        su_s = f"{su:.3e}" if su else ""
        print(f"{label:28s} {dt * 1e3:10.3f} {su_s:>16s}")

    if args.trace:
        cfg, prog = build()
        f = jax.jit(lambda bl: engine.loglikelihood(
            prog, cfg, model, bl, tipchars, pw, inv))
        jax.block_until_ready(f(bl0))
        with jax.profiler.trace(args.trace):
            jax.block_until_ready(f(bl0 * 1.0000001))
        print(f"trace written to {args.trace} (open with TensorBoard)")


if __name__ == "__main__":
    main()
