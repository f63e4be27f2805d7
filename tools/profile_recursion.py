"""Attribute the fused round's device time: recursion vs scoring.

Chained timings of three programs over the real ball groups:
  1. recursion only  (vmapped recurse_one per group, scores skipped)
  2. recursion + kernel scoring   (the production path)
  3. base sweep alone

Usage: python tools/profile_recursion.py [tips] [sites] [radius] [reps]
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
from libpll2_tpu import engine, search_fast as sf  # noqa: E402
from libpll2_tpu import tree as T  # noqa: E402
from libpll2_tpu.config import PartitionConfig  # noqa: E402
from libpll2_tpu.tree.generate import random_newick, random_tipchars  # noqa: E402


def main():
    tips = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    sites = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    radius = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    rng = np.random.default_rng(7)
    tree = T.parse_newick_string(random_newick(tips, rng))
    raw = random_tipchars(tips, sites, rng)
    chars = {n.label: raw[n.clv_index].astype(np.uint64)
             for n in tree.nodes[:tips]}
    cfg = PartitionConfig(
        tips=tips, clv_buffers=tree.inner_count, states=4, sites=sites,
        rate_matrices=1, prob_matrices=2 * tips - 3, rate_cats=4,
        scale_buffers=tree.inner_count, dtype=jnp.float32)
    model = engine.make_model(
        [[1.0, 2.0, 1.0, 1.0, 2.0, 1.0]], [[0.25] * 4],
        pll.compute_gamma_cats(1.0, 4), dtype=jnp.float32)
    prog = sf.compile_spr(tree, cfg, radius=radius)
    cfgx = prog.cfg_ext
    tipchars = sf._tipchars_for(prog, chars)
    pw_d, inv_d = sf._aux_arrays(prog)
    bl = jnp.asarray(prog.branch_lengths, cfgx.dtype)
    lops = jnp.asarray(prog.level_ops)
    pslots = jnp.asarray(prog.pmatrix_slots)
    gdev = tuple((tuple(jnp.asarray(a) for a in g.ball_levels),
                  jnp.asarray(g.score_ops), jnp.asarray(g.sub_rows),
                  jnp.asarray(g.edge_pos), jnp.asarray(g.merge_edges))
                 for g in prog.ball_groups)

    def recursion_only(blp):
        base_clv, base_scal, pmatrix, halves = sf._spr_base(
            cfgx, model, lops, pslots, blp, tipchars)
        acc = jnp.float32(0.0)
        for (lvls, sops, srows, epos, medges) in gdev:
            Cg = sops.shape[0]
            # mirror of _score_group's recurse_one closure inputs
            out = sf._score_group(
                cfgx, model, base_clv, base_scal, pmatrix, halves, blp,
                pw_d, inv_d, lvls, sops, srows, epos, medges,
                ball_slots=prog.ball_slots, newton_iters=0,
                use_kernel=False, score_batch=1_000_000)
            # newton_iters=0 + one score mega-batch approximates
            # recursion + minimal scoring; cheaper probe below uses the
            # kernel path
            acc = acc + jnp.max(out[0])
        return acc

    def make_chain(body):
        @jax.jit
        def chain(bl0):
            def step(c, _):
                return body(bl0 * (1.0 + 1e-9 * c)), None
            last, _ = jax.lax.scan(step, jnp.float32(0.0), None,
                                   length=reps)
            return last
        return chain

    # pure recursion: vmap recurse_one via _score_group internals is not
    # exported; emulate by scoring with newton_iters=0 on the KERNEL path
    # (scorer cost there is small and measured separately)
    def round_body(use_kernel, newton):
        def body(blp):
            logl0, outs = sf._spr_round_device(
                cfgx, model, lops, pslots, blp, tipchars, pw_d, inv_d,
                jnp.asarray(prog.edge_rows)[prog.root_edge],
                pslots[prog.root_edge], gdev,
                ball_slots=prog.ball_slots, newton_iters=newton,
                use_kernel=use_kernel)
            mx = logl0
            for s, _ in outs:
                mx = jnp.maximum(mx, jnp.max(s))
            return mx
        return body

    for name, body in (("round kernel n3", round_body(True, 3)),
                       ("round kernel n0", round_body(True, 0)),
                       ):
        chain = make_chain(body)
        t0 = time.time()
        jax.block_until_ready(chain(bl))
        print(f"{name}: compile {time.time()-t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready(chain(bl * 1.0000001))
            best = min(best, (time.perf_counter() - t0) / reps)
        print(f"{name}: {best*1e3:.0f} ms", flush=True)


if __name__ == "__main__":
    main()
