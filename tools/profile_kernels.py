"""A/B-profile the VMEM tree-sweep kernels on the current backend.

Times the ungrouped (SU) kernel vs the grouped MXU kernel across site
blocks and matmul precisions, using chained data-dependent dispatches
(the only trustworthy timing through the axon tunnel).

Usage: python tools/profile_kernels.py [tips] [sites]
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import libpll2_tpu as pll  # noqa: E402
from libpll2_tpu import engine  # noqa: E402
from libpll2_tpu import tree as T  # noqa: E402
from libpll2_tpu.config import PartitionConfig  # noqa: E402
from libpll2_tpu.ops import partials_pallas_tree as ppt  # noqa: E402
from libpll2_tpu.ops import pmatrix as pmatrix_ops  # noqa: E402
from libpll2_tpu.tree.generate import balanced_newick, random_tipchars  # noqa: E402

TIPS = int(sys.argv[1]) if len(sys.argv) > 1 else 256
SITES = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
REPS = 32


def chained(fn, *args):
    """Median chained per-iteration time of fn(*args) -> pytree."""

    @jax.jit
    def chain(seed):
        def body(carry, _):
            out = fn(*args, seed=carry)
            leaf = jax.tree_util.tree_leaves(out)[0]
            return leaf.reshape(-1)[0].astype(jnp.float32), None
        last, _ = jax.lax.scan(body, seed, None, length=REPS)
        return last

    jax.block_until_ready(chain(jnp.float32(0.0)))
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(jnp.float32(1e-12)))
        dt = min(dt, (time.perf_counter() - t0) / REPS)
    return dt


def main():
    rng = np.random.default_rng(0)
    tree = T.parse_newick_string(balanced_newick(TIPS))
    raw = random_tipchars(TIPS, SITES, rng)

    for precision in ("highest", "default"):
        cfg = PartitionConfig(
            tips=TIPS, clv_buffers=tree.inner_count, states=4, sites=SITES,
            rate_matrices=1, prob_matrices=2 * TIPS - 3, rate_cats=4,
            scale_buffers=tree.inner_count, dtype=jnp.float32,
            pallas_precision=precision)
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
        n_ops = TIPS - 2

        for tb in (2048, 4096, 8192, 16384):
            if cfg.sites_padded % tb:
                continue
            nt = cfg.sites_padded // tb
            tip_b = jnp.transpose(
                tipchars.astype(jnp.int32).reshape(cfg.tips, nt, tb),
                (1, 0, 2))

            def run(mode, seed):
                return ppt.sweep(tip_b, pmats * (1.0 + seed),
                                 program.vmem_prog, cfg, tb, mode=mode)

            def run_static(seed):
                return ppt.sweep_static(tip_b, pmats * (1.0 + seed),
                                        program.vmem_prog, cfg, tb)

            for name, fn in (
                    ("static", run_static),
                    ("mxu", functools.partial(run, "mxu")),
                    ("vpu", functools.partial(run, "vpu")),
                    ("splitk", functools.partial(run, "splitk"))):
                try:
                    dt = chained(fn)
                except Exception as exc:  # noqa: BLE001
                    print(f"{precision:8s} tb={tb:6d} {name:8s} FAIL "
                          f"{type(exc).__name__}: {str(exc)[:80]}")
                    continue
                ups = n_ops * SITES / dt
                print(f"{precision:8s} tb={tb:6d} {name:8s} "
                      f"{dt * 1e3:7.2f} ms  {ups:.3e} upd/s", flush=True)


if __name__ == "__main__":
    main()
