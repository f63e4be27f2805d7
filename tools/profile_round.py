"""Attribute the fused SPR round device program's time on-chip.

Chained in-jit iterations (the only trustworthy timing through the axon
tunnel) of four programs:
  1. base sweep alone            (_spr_base)
  2. fused round, kernel scorer  (_spr_round_device use_kernel=True)
  3. fused round, XLA scorer     (use_kernel=False)
  4. fused round, kernel, newton_iters=0  (Newton share)

(2)-(1) = recursion+scoring; (2) vs (3) = scorer implementation delta;
(2)-(4) = Newton share inside the kernel.

Usage: python tools/profile_round.py [tips] [sites] [radius] [reps]
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

    jax.config.update("jax_compilation_cache_dir", ".jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = jnp.float32 if on_tpu else jnp.float64
    print(f"backend={jax.default_backend()} tips={tips} sites={sites} "
          f"radius={radius}", flush=True)

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

    prog = search_fast.compile_spr(tree, cfg, radius=radius)
    print(f"groups={[len(g.cand_ids) for g in prog.ball_groups]} "
          f"shapes={[g.shape_key for g in prog.ball_groups]} "
          f"slots_total={sum(len(g.cand_ids) * g.score_ops.shape[1] for g in prog.ball_groups)}",
          flush=True)

    cfgx = prog.cfg_ext
    tipchars = search_fast._tipchars_for(prog, chars)
    pw_d, inv_d = search_fast._aux_arrays(prog)
    bl = jnp.asarray(prog.branch_lengths, cfgx.dtype)
    lops = jnp.asarray(prog.level_ops)
    erow = jnp.asarray(prog.edge_rows)
    pslots = jnp.asarray(prog.pmatrix_slots)
    gdev = tuple((tuple(jnp.asarray(a) for a in g.ball_levels),
                  jnp.asarray(g.score_ops), jnp.asarray(g.sub_rows),
                  jnp.asarray(g.edge_pos), jnp.asarray(g.merge_edges))
                 for g in prog.ball_groups)
    rr = erow[prog.root_edge]
    rs = pslots[prog.root_edge]

    def timed(name, fn):
        t0 = time.time()
        jax.block_until_ready(fn(bl))
        print(f"{name}: compile+first {time.time()-t0:.1f}s", flush=True)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(bl * 1.0000001))
            best = min(best, (time.perf_counter() - t0) / reps)
        print(f"{name}: {best*1e3:.0f} ms/iter", flush=True)
        return best

    def make_chain(body_of):
        @jax.jit
        def chain(bl0):
            def body(carry, _):
                blp = bl0 * (1.0 + 1e-9 * carry)
                return body_of(blp), None
            last, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                   length=reps)
            return last
        return chain

    def base_body(blp):
        base_clv, base_scal, _, _ = search_fast._spr_base(
            cfgx, model, lops, pslots, blp, tipchars)
        return jnp.max(base_clv[-1]) + base_scal[0, 0].astype(jnp.float32)

    def round_body(use_kernel, newton):
        def body(blp):
            logl0, outs = search_fast._spr_round_device(
                cfgx, model, lops, pslots, blp, tipchars, pw_d, inv_d,
                rr, rs, gdev, ball_slots=prog.ball_slots,
                newton_iters=newton, use_kernel=use_kernel)
            mx = logl0
            for s, _t3 in outs:
                mx = jnp.maximum(mx, jnp.max(s))
            return mx
        return body

    timed("base sweep", make_chain(base_body))
    timed("round kernel n3", make_chain(round_body(True, 3)))
    timed("round kernel n0", make_chain(round_body(True, 0)))
    timed("round XLA    n3", make_chain(round_body(False, 3)))


if __name__ == "__main__":
    main()
