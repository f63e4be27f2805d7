"""Diagnose the ~540-1000s first-scan compile seen through the axon
remote-compile tunnel: is it a per-process fixed cost (any lax.scan), a
closure-constant cost (big arrays captured by the scanned body), or
specific to scanning a Pallas call?

Stages, timed separately in ONE process:
  1. trivial scan (scalar body)
  2. scan over a big-elementwise body with a 64MB closed-over constant
  3. the kbench static-kernel scan
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")


def t(label, f):
    t0 = time.perf_counter()
    jax.block_until_ready(f())
    print(f"{label:40s} {time.perf_counter() - t0:8.1f}s", flush=True)


def main():
    print(f"backend={jax.default_backend()}", flush=True)

    @jax.jit
    def triv(x):
        def body(c, _):
            return c * 1.000001 + 1.0, None
        last, _ = jax.lax.scan(body, x, None, length=64)
        return last

    t("trivial scan", lambda: triv(jnp.float32(1.0)))

    big = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((256, 65536), np.float32))

    @jax.jit
    def bigscan(x):
        def body(c, _):
            r = jnp.sum(big * (1.0 + 1e-12 * c))
            return r * 1e-20, None
        last, _ = jax.lax.scan(body, x, None, length=64)
        return last

    t("scan w/ 64MB closure constant", lambda: bigscan(jnp.float32(0.0)))

    import libpll2_tpu as pll  # noqa: E402
    from libpll2_tpu import engine
    from libpll2_tpu import tree as T
    from libpll2_tpu.config import PartitionConfig
    from libpll2_tpu.ops import partials_pallas_tree as ppt
    from libpll2_tpu.ops import pmatrix as pmatrix_ops
    from libpll2_tpu.tree.generate import balanced_newick, random_tipchars

    TIPS, SITES, TB = 256, 65536, 2048
    rng = np.random.default_rng(0)
    tree = T.parse_newick_string(balanced_newick(TIPS))
    raw = random_tipchars(TIPS, SITES, rng)
    cfg = PartitionConfig(
        tips=TIPS, clv_buffers=tree.inner_count, states=4, sites=SITES,
        rate_matrices=1, prob_matrices=2 * TIPS - 3, rate_cats=4,
        scale_buffers=tree.inner_count, dtype=jnp.float32,
        pallas_precision=sys.argv[1] if len(sys.argv) > 1 else "highest")
    program = engine.compile_tree(tree, cfg)
    model = engine.make_model(
        [[1.0, 2.0, 1.0, 1.0, 2.0, 1.0]], [[0.25] * 4],
        pll.compute_gamma_cats(1.0, 4), dtype=jnp.float32)
    tipchars = jnp.asarray(engine.pad_tipchars(raw, cfg))
    num_slots = int(program.pmatrix_indices.max()) + 1
    pmats = jnp.zeros((num_slots, 4, 4, 4), jnp.float32)
    new = pmatrix_ops.compute_pmatrices(
        jnp.asarray(program.default_branch_lengths, jnp.float32),
        model.eigenvals, model.eigenvecs, model.inv_eigenvecs,
        model.rates, model.prop_invar, model.params_indices,
        dtype=jnp.float32)
    pmats = pmats.at[jnp.asarray(program.pmatrix_indices)].set(new)
    nt = cfg.sites_padded // TB
    tip_b = jnp.transpose(
        tipchars.astype(jnp.int32).reshape(cfg.tips, nt, TB), (1, 0, 2))

    def fn(seed):
        return ppt.sweep_static(tip_b, pmats * (1.0 + seed),
                                program.vmem_prog, cfg, TB)

    t("standalone static kernel", lambda: fn(jnp.float32(0.0)))

    @jax.jit
    def chain(seed):
        def body(carry, _):
            out = fn(carry)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return leaf.reshape(-1)[0].astype(jnp.float32) * 1e-20, None
        last, _ = jax.lax.scan(body, seed, None, length=64)
        return last

    t("scan over static kernel", lambda: chain(jnp.float32(0.0)))

    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(jnp.float32(1e-12)))
        dt = min(dt, (time.perf_counter() - t0) / 64)
    ups = (TIPS - 2) * SITES / dt
    print(f"static+qtips tb={TB}: {dt * 1e3:.2f} ms  {ups:.3e} upd/s",
          flush=True)


if __name__ == "__main__":
    main()
