"""Measure COMPILE TIME and throughput of the VMEM sweep kernels per
(mode, site-block) on the current backend.

The Mosaic compile cost of the unrolled static kernel scales roughly with
n_ops x (tb / lane-tile): this harness quantifies that and the throughput
cost of smaller blocks, to pick STATIC_MAX_TB / the block policy.

Usage: python tools/kbench.py [tips] [sites] [modes..]
Env: KB_BLOCKS=..., KB_PREC=highest|high|default, KB_STATES=4|20
"""
from __future__ import annotations

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
MODES = sys.argv[3:] or ["static", "splitk"]
REPS = 32
BLOCKS = [int(b) for b in
          __import__("os").environ.get(
              "KB_BLOCKS", "256,512,1024,2048").split(",")]


def main():
    import os
    states = int(os.environ.get("KB_STATES", 4))
    rng = np.random.default_rng(0)
    tree = T.parse_newick_string(balanced_newick(TIPS))
    cfg = PartitionConfig(
        tips=TIPS, clv_buffers=tree.inner_count, states=states, sites=SITES,
        rate_matrices=1, prob_matrices=2 * TIPS - 3, rate_cats=4,
        scale_buffers=tree.inner_count, dtype=jnp.float32,
        pallas_precision=os.environ.get("KB_PREC", "highest"))
    program = engine.compile_tree(tree, cfg)
    if states == 4:
        model = engine.make_model(
            [[1.0, 2.0, 1.0, 1.0, 2.0, 1.0]], [[0.25] * 4],
            pll.compute_gamma_cats(1.0, 4), dtype=jnp.float32)
        raw = random_tipchars(TIPS, SITES, rng)
    else:
        from libpll2_tpu.models.aa import aa_model
        lg_rates, lg_freqs = aa_model("lg")
        model = engine.make_model([lg_rates], [lg_freqs],
                                  pll.compute_gamma_cats(1.0, 4),
                                  dtype=jnp.float32)
        raw = (np.uint64(1) << rng.integers(0, states, (TIPS, SITES),
                                            dtype=np.uint64))
    tipchars = jnp.asarray(engine.pad_tipchars(raw, cfg))
    num_slots = int(program.pmatrix_indices.max()) + 1
    pmats = jnp.zeros((num_slots, 4, states, states), jnp.float32)
    new = pmatrix_ops.compute_pmatrices(
        jnp.asarray(program.default_branch_lengths, jnp.float32),
        model.eigenvals, model.eigenvecs, model.inv_eigenvecs,
        model.rates, model.prop_invar, model.params_indices,
        dtype=jnp.float32)
    pmats = pmats.at[jnp.asarray(program.pmatrix_indices)].set(new)
    n_ops = TIPS - 2
    print(f"backend={jax.default_backend()} ops={n_ops} sites={SITES}",
          flush=True)

    for tb in BLOCKS:
        if cfg.sites_padded % tb:
            continue
        nt = cfg.sites_padded // tb
        tip_b = jnp.transpose(
            tipchars.astype(jnp.int32).reshape(cfg.tips, nt, tb), (1, 0, 2))

        for mode in MODES:
            # big arrays are ARGUMENTS of the jitted chain: closing over
            # them embeds 64MB HLO constants that cost ~400s of extra
            # cold compile through the remote-compile tunnel (scanprobe.py)
            if mode == "never-static2":
                def fn(seed, tip_b, pmats, tb=tb):
                    return ppt.sweep_static2(
                        tip_b, pmats * (1.0 + seed), program.vmem_prog,
                        cfg, tb)
            elif mode == "static":
                def fn(seed, tip_b, pmats, tb=tb):
                    return ppt.sweep_static(
                        tip_b, pmats * (1.0 + seed), program.vmem_prog,
                        cfg, tb)
            else:
                def fn(seed, tip_b, pmats, tb=tb, mode=mode):
                    return ppt.sweep(tip_b, pmats * (1.0 + seed),
                                     program.vmem_prog, cfg, tb, mode=mode)

            @jax.jit
            def chain(seed, tip_b, pmats, fn=fn):
                def body(carry, _):
                    out = fn(carry, tip_b, pmats)
                    leaf = jax.tree_util.tree_leaves(out)[0]
                    return leaf.reshape(-1)[0].astype(jnp.float32) * 1e-20, \
                        None
                last, _ = jax.lax.scan(body, seed, None, length=REPS)
                return last

            try:
                t0 = time.perf_counter()
                jax.block_until_ready(fn(jnp.float32(0.0), tip_b, pmats))
                t_compile1 = time.perf_counter() - t0
                t0 = time.perf_counter()
                jax.block_until_ready(chain(jnp.float32(0.0), tip_b, pmats))
                t_compile2 = time.perf_counter() - t0
            except Exception as exc:  # noqa: BLE001
                print(f"tb={tb:6d} {mode:8s} FAIL "
                      f"{type(exc).__name__}: {str(exc)[:100]}", flush=True)
                continue
            dt = float("inf")
            for i in range(3):
                # distinct argument per rep: the tunnel DEDUPES identical
                # dispatches and reports ~0 for repeated calls
                t0 = time.perf_counter()
                jax.block_until_ready(chain(jnp.float32(1e-12 * (i + 1)),
                                            tip_b, pmats))
                dt = min(dt, (time.perf_counter() - t0) / REPS)
            ups = n_ops * SITES / dt
            print(f"tb={tb:6d} {mode:8s} compile {t_compile1:6.1f}s "
                  f"+scan {t_compile2:6.1f}s   {dt * 1e3:7.2f} ms  "
                  f"{ups:.3e} upd/s", flush=True)


if __name__ == "__main__":
    main()
