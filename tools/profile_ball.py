"""Break down one radius-limited SPR round on the current backend.

Times, with chained in-jit iterations (the only trustworthy method
through the axon tunnel — see .claude/skills/verify/SKILL.md):
  * _logl_rt                  (one full message sweep + edge logL)
  * full grouped ball scoring (base sweep + per-group recursion+Newton)
  * host compile_spr          (per-round program rebuild)

Usage: python tools/profile_ball.py [tips] [sites] [radius] [reps]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import libpll2_tpu as pll  # noqa: E402
from libpll2_tpu import engine, search_fast  # noqa: E402
from libpll2_tpu import tree as T  # noqa: E402
from libpll2_tpu.config import PartitionConfig  # noqa: E402
from libpll2_tpu.tree.generate import random_newick, random_tipchars  # noqa: E402


def main():
    tips = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    sites = int(sys.argv[2]) if len(sys.argv) > 2 else 4096
    radius = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    reps = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = jnp.float32 if on_tpu else jnp.float64
    print(f"backend={jax.default_backend()} dtype={dtype.__name__} "
          f"tips={tips} sites={sites} radius={radius}")

    rng = np.random.default_rng(7)
    tree = T.parse_newick_string(random_newick(tips, rng))
    raw = random_tipchars(tips, sites, rng)
    chars = {n.label: raw[n.clv_index].astype(np.uint64)
             for n in tree.nodes[:tips]}

    cfg = PartitionConfig(
        tips=tips, clv_buffers=tree.inner_count, states=4, sites=sites,
        rate_matrices=1, prob_matrices=2 * tips - 3, rate_cats=4,
        scale_buffers=tree.inner_count, dtype=dtype)
    model = engine.make_model(
        [[1.0, 2.0, 1.0, 1.0, 2.0, 1.0]], [[0.25, 0.25, 0.25, 0.25]],
        pll.compute_gamma_cats(1.0, 4), dtype=dtype)

    t0 = time.time()
    prog = search_fast.compile_spr(tree, cfg, radius=radius)
    t_compile_host = time.time() - t0
    shapes = [g.shape_key for g in prog.ball_groups]
    sizes = [len(g.cand_ids) for g in prog.ball_groups]
    print(f"host compile_spr: {t_compile_host:.2f}s  groups={sizes} "
          f"shapes={shapes} ball_slots={prog.ball_slots} "
          f"level_ops={prog.level_ops.shape}")

    cfgx = prog.cfg_ext
    tipchars = search_fast._tipchars_for(prog, chars)
    pw_d, inv_d = search_fast._aux_arrays(prog)
    bl = jnp.asarray(prog.branch_lengths, cfgx.dtype)
    lops = jnp.asarray(prog.level_ops)
    erow = jnp.asarray(prog.edge_rows)
    pslots = jnp.asarray(prog.pmatrix_slots)
    gdev = [(tuple(jnp.asarray(a) for a in g.ball_levels),
             jnp.asarray(g.score_ops), jnp.asarray(g.sub_rows),
             jnp.asarray(g.edge_pos), jnp.asarray(g.merge_edges))
            for g in prog.ball_groups]

    @jax.jit
    def chain(bl0):
        def body(carry, _):
            blp = bl0 * (1.0 + 1e-9 * carry)
            base = search_fast._spr_base(cfgx, model, lops, pslots, blp,
                                         tipchars)
            mx = -jnp.inf
            for lvls, sops, srows, epos, medges in gdev:
                s, _t3 = search_fast._spr_ball_scores(
                    cfgx, model, *base, blp, pw_d, inv_d,
                    lvls, sops, srows, epos, medges,
                    ball_slots=prog.ball_slots)
                mx = jnp.maximum(mx, jnp.max(s))
            return mx, None
        last, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return last

    t0 = time.time()
    r = chain(bl)
    jax.block_until_ready(r)
    print(f"grouped ball scoring compile+{reps} runs: {time.time()-t0:.1f}s")
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        r = chain(bl * 1.0000001)
        jax.block_until_ready(r)
        best = min(best, (time.perf_counter() - t0) / reps)
    print(f"grouped ball scoring: {best * 1e3:.0f} ms/round "
          f"(chk {float(r):.1f})")

    def run_logl():
        return search_fast._logl_rt(
            cfgx, model, lops, pslots, bl, tipchars, pw_d, inv_d,
            erow[prog.root_edge], pslots[prog.root_edge])

    t0 = time.time()
    jax.block_until_ready(run_logl())
    print(f"_logl_rt compile+run: {time.time() - t0:.2f}s")
    t0 = time.time()
    for _ in range(3):
        jax.block_until_ready(run_logl())
    print(f"_logl_rt warm: {(time.time() - t0) / 3 * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
