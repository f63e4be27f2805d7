"""Quantify the compute-reduction potential of site repeats on the fused
engine path (VERDICT r3 weak #6 / ROADMAP #4).

The reference's published 1.2-1.5x RAxML-NG win (README.md:8) is
wall-clock, not memory: class-indexed CLVs skip *computing* duplicate
subtree columns.  The fused TPU engine runs dense.  This tool measures,
on a repeat-heavy alignment (gappy partitioned blocks — the structure
real ribosomal/partitioned data has):

  1. the per-operation class structure (repeats.py, reference-exact),
     giving the exact fraction of CLV site-columns repeats would skip;
  2. the dense engine's full-tree logL latency on TPU (chained);
  3. the latency of the same sweep with per-op site counts REDUCED to
     the class counts (the compute a class-gather kernel would do),
     approximated by running the dense kernel on the equivalent total
     column count — an OPTIMISTIC bound for class-gather (it pays zero
     gather/scatter overhead for the indirection);
  4. a gather-overhead microbenchmark: one [R, S, T] gather per child
     per op, the indirection a class-gather kernel adds.

class-gather wins only if (2) - (3) > (4)-scaled overhead.

Usage: python tools/repeats_quantify.py [tips] [sites]
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
from libpll2_tpu.repeats import Repeats  # noqa: E402
from libpll2_tpu.tree import create_operations, traverse  # noqa: E402
from libpll2_tpu.tree.generate import random_newick, simulate_alignment  # noqa: E402


def gappy_alignment(tips: int, sites: int, rng) -> dict:
    """Simulated alignment with the repeat structure of real multi-gene
    data: each taxon covers ~40% of the sites (contiguous gene blocks),
    the rest is gap — pruned-subtree columns repeat heavily wherever a
    block is all-gap below a node."""
    tree = T.parse_newick_string(
        random_newick(tips, rng, min_bl=0.02, max_bl=0.3))
    rates = pll.compute_gamma_cats(0.9, 4)
    chars = simulate_alignment(tree, sites, rng,
                               [1.2, 2.7, 0.8, 1.1, 3.0, 1.0],
                               [0.28, 0.24, 0.22, 0.26], rates)
    n_blocks = 16
    bl = sites // n_blocks
    for lab in chars:
        covered = rng.random(n_blocks) < 0.4
        for b in range(n_blocks):
            if not covered[b]:
                chars[lab][b * bl:(b + 1) * bl] = 15   # gap
    return tree, chars


def main():
    tips = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    sites = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    rng = np.random.default_rng(11)
    tree, chars = gappy_alignment(tips, sites, rng)

    # ---- 1. exact class structure over the tree ------------------------
    trav = traverse(tree.vroot)
    ops, _, _ = create_operations(trav)
    rep = Repeats(2 * tips, 2 * tips, sites, additional_sites=0)
    labels = {n.clv_index: n.label for n in tree.nodes[:tips]}
    for i in range(tips):
        rep.update_tip(i, np.asarray(chars[labels[i]], np.uint32))
    total_cols = 0
    class_cols = 0
    for op in ops:
        nc = sites
        if rep.enable(op.child1_clv_index, op.child2_clv_index):
            rep.update(op.parent_clv_index, op.child1_clv_index,
                       op.child2_clv_index, parent_scaler=-1)
            n = rep.sites_number(op.parent_clv_index)
            nc = n if n else sites
        total_cols += sites
        class_cols += nc
    frac = class_cols / total_cols
    print(f"ops={len(ops)} dense columns={total_cols}  "
          f"class columns={class_cols}  compute fraction={frac:.3f} "
          f"(repeats skip {100 * (1 - frac):.1f}%)")

    # ---- 2/3. dense engine latency at full vs reduced column count -----
    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = jnp.float32 if on_tpu else jnp.float64
    rates = pll.compute_gamma_cats(0.9, 4)
    model = engine.make_model([[1.2, 2.7, 0.8, 1.1, 3.0, 1.0]],
                              [[0.28, 0.24, 0.22, 0.26]], rates,
                              dtype=dtype)

    def engine_latency(nsites: int, reps: int = 32) -> float:
        cfg = PartitionConfig(
            tips=tips, clv_buffers=tree.inner_count, states=4,
            sites=nsites, rate_matrices=1, prob_matrices=2 * tips - 3,
            rate_cats=4, scale_buffers=tree.inner_count, dtype=dtype)
        program = engine.compile_tree(tree, cfg)
        raw = np.zeros((tips, cfg.sites_alloc), np.uint64)
        for idx, lab in labels.items():
            raw[idx] = np.resize(np.asarray(chars[lab], np.uint64),
                                 cfg.sites_alloc)
        tipchars = jnp.asarray(engine.pad_tipchars(raw, cfg))
        pw = np.zeros(cfg.sites_padded)
        pw[:nsites] = 1.0
        pw = jnp.asarray(pw, dtype)
        inv = jnp.asarray(np.full(cfg.sites_padded, -1, np.int32))
        blen = jnp.asarray(program.default_branch_lengths, dtype)

        @jax.jit
        def chain(b0, tipchars, pw, inv):
            def body(carry, _):
                r = engine.loglikelihood(program, cfg, model,
                                         b0 * (1.0 + 1e-12 * carry),
                                         tipchars, pw, inv)
                return r, None
            last, _ = jax.lax.scan(body, jnp.asarray(0.0, dtype), None,
                                   length=reps)
            return last

        jax.block_until_ready(chain(blen, tipchars, pw, inv))
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready(chain(blen * 1.0000001, tipchars, pw,
                                        inv))
            best = min(best, (time.perf_counter() - t0) / reps)
        return best

    eq_sites = max(256, int(np.ceil(frac * sites / 256)) * 256)
    t_dense = engine_latency(sites)
    t_classes = engine_latency(eq_sites)
    print(f"dense engine logL:   {t_dense * 1e3:8.3f} ms @ {sites} sites")
    print(f"class-count logL:    {t_classes * 1e3:8.3f} ms @ {eq_sites} "
          f"sites (optimistic class-gather bound, zero gather cost)")

    # ---- 4. gather overhead per op ------------------------------------
    R, S = 4, 4
    clv = jnp.asarray(np.random.rand(R, S, sites), dtype)
    idx = jnp.asarray(rng.integers(0, sites, sites), np.int32)

    @jax.jit
    def gchain(clv, idx):
        def body(c, _):
            g = clv[:, :, idx] * (1.0 + 1e-12 * c)
            return jnp.max(g), None
        last, _ = jax.lax.scan(body, jnp.asarray(0.0, dtype), None,
                               length=64)
        return last

    jax.block_until_ready(gchain(clv, idx))
    t0 = time.perf_counter()
    jax.block_until_ready(gchain(clv, idx))
    t_gather = (time.perf_counter() - t0) / 64
    n_gathers = 2 * len(ops)
    print(f"site gather [R,S,{sites}]: {t_gather * 1e6:.1f} us; "
          f"x{n_gathers} gathers/sweep = "
          f"{t_gather * n_gathers * 1e3:.3f} ms added indirection")
    win = t_dense - (t_classes + t_gather * n_gathers)
    print(f"class-gather net vs dense: {-win * 1e3:+.3f} ms "
          f"({'WINS' if win > 0 else 'LOSES'} under the optimistic bound)")


if __name__ == "__main__":
    main()
