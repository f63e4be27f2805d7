"""Isolate the ball recursion's scatter/gather cost in the fused round.

Three chained timings over the real ball groups (kernel scorer on):
  A. production round                      (scatter writes + gathers)
  B. recursion with scratch SCATTER removed (parents computed, not
     stored — levels read zeros; numerically wrong, timing-relevant)
  C. recursion with base GATHERS replaced by row 0 (scatter kept)

(A - B) ~ scatter share;  (A - C) ~ gather share.

Usage: python tools/profile_scatter.py [tips] [sites] [radius] [reps]
"""
from __future__ import annotations

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
from libpll2_tpu.ops import pmatrix as pmatrix_ops  # noqa: E402
from libpll2_tpu.tree.generate import random_newick, random_tipchars  # noqa: E402

BOP = sf


def variant_round(cfgx, model, prog, gdev, lops, pslots, tipchars, pw_d,
                  inv_d, no_scatter: bool, no_gather: bool):
    """_spr_round_device clone with recursion knobs."""
    dtype = cfgx.dtype
    hi = jax.lax.Precision.HIGHEST
    thresh = jnp.asarray(cfgx.scale_threshold, dtype)
    factor = jnp.asarray(cfgx.scale_factor, dtype)

    def body(blp):
        base_clv, base_scal, pmatrix, halves = sf._spr_base(
            cfgx, model, lops, pslots, blp, tipchars)
        acc = jnp.float32(0.0)
        for (lvls, sops, srows, epos, medges) in gdev:
            def recurse_one(c, lvls=lvls, srows=srows, epos=epos,
                            medges=medges):
                m = medges[c]
                merged = pmatrix_ops.compute_pmatrices(
                    (blp[m[0]] + blp[m[1]])[None],
                    model.eigenvals, model.eigenvecs, model.inv_eigenvecs,
                    model.rates, model.prop_invar, model.params_indices,
                    dtype=dtype)[0]
                sub_scal = base_scal[srows[c, 1]]
                t3_0 = blp[epos[c]]
                scratch = jnp.zeros((prog.ball_slots, cfgx.rate_cats,
                                     cfgx.states, base_clv.shape[-1]),
                                    dtype)
                sscr = jnp.zeros((prog.ball_slots, base_clv.shape[-1]),
                                 jnp.int32)
                for lv_all in lvls:
                    lv = lv_all[c]
                    seed = lv[:, sf.BOP_C1_SEED] == 1
                    scr_idx = jnp.where(seed, 0, lv[:, sf.BOP_C1_ROW])
                    if no_gather:
                        c1 = jnp.broadcast_to(
                            base_clv[0][None],
                            (lv.shape[0],) + base_clv[0].shape)
                        c2 = c1
                        s1 = jnp.zeros((lv.shape[0],
                                        base_clv.shape[-1]), jnp.int32)
                        s2 = s1
                        p1 = jnp.broadcast_to(
                            merged[None],
                            (lv.shape[0],) + merged.shape)
                        p2 = p1
                    else:
                        c1 = jnp.where(seed[:, None, None, None],
                                       base_clv[lv[:, sf.BOP_C1_ROW]],
                                       scratch[scr_idx])
                        s1 = jnp.where(
                            seed[:, None],
                            base_scal[lv[:, sf.BOP_C1_SCAL]],
                            sscr[jnp.where(seed, 0,
                                           lv[:, sf.BOP_C1_SCAL])])
                        p1 = jnp.where(seed[:, None, None, None],
                                       merged[None],
                                       pmatrix[lv[:, sf.BOP_C1_PM]])
                        c2 = base_clv[lv[:, sf.BOP_C2_ROW]]
                        s2 = base_scal[lv[:, sf.BOP_C2_SCAL]]
                        p2 = pmatrix[lv[:, sf.BOP_C2_PM]]
                    left = jnp.einsum("wrij,wrjt->writ", p1, c1,
                                      preferred_element_type=dtype,
                                      precision=hi)
                    right = jnp.einsum("wrij,wrjt->writ", p2, c2,
                                       preferred_element_type=dtype,
                                       precision=hi)
                    parent = left * right
                    mask = jnp.all(parent < thresh, axis=(1, 2))
                    parent = jnp.where(mask[:, None, None, :],
                                       parent * factor, parent)
                    snew = s1 + s2 + mask.astype(jnp.int32)
                    if no_scatter:
                        scratch = scratch + 0.0 * jnp.sum(parent)
                        sscr = sscr + 0 * jnp.sum(snew)
                    else:
                        scratch = scratch.at[lv[:, sf.BOP_PARENT]].set(
                            parent)
                        sscr = sscr.at[lv[:, sf.BOP_PARENT]].set(snew)
                return scratch, sscr, sub_scal, t3_0

            s, _t3 = sf._score_group_kernel(
                cfgx, model, base_clv, base_scal, halves, blp, pw_d,
                sops, srows, epos, recurse_one, prog.ball_slots, 3, 16,
                False)
            acc = acc + jnp.max(s)
        return acc
    return body


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

    for name, ns, ng in (("A production", False, False),
                         ("B no-scatter", True, False),
                         ("C no-gather ", False, True)):
        body = variant_round(cfgx, model, prog, gdev, lops, pslots,
                             tipchars, pw_d, inv_d, ns, ng)

        @jax.jit
        def chain(bl0, body=body):
            def step(c, _):
                return body(bl0 * (1.0 + 1e-9 * c)), None
            last, _ = jax.lax.scan(step, jnp.float32(0.0), None,
                                   length=reps)
            return last

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
