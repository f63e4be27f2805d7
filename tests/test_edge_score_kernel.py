"""Fused Pallas edge scorer vs the XLA scoring path (interpret mode).

The kernel (ops/edge_score_pallas.py) must reproduce the XLA per-slot
sumtable + Newton + logL pipeline to f32 tolerance over a whole radius
program: every valid (candidate, regraft-edge) score and refined branch
length."""
import jax
import jax.numpy as jnp
import numpy as np

import libpll2_tpu as pll
from libpll2_tpu import engine, search_fast
from libpll2_tpu import tree as T
from libpll2_tpu.config import PartitionConfig

from libpll2_tpu.tree.generate import random_newick, simulate_alignment

SUBST = [1.2, 2.7, 0.8, 1.1, 3.0, 1.0]
FREQS = [0.28, 0.24, 0.22, 0.26]


def test_kernel_matches_xla_scores():
    n_tips, sites = 12, 256
    rng = np.random.default_rng(5)
    tree = T.parse_newick_string(random_newick(n_tips, rng))
    rates = pll.compute_gamma_cats(0.8, 4)
    chars = simulate_alignment(tree, sites, rng, SUBST, FREQS, rates)
    cfg = PartitionConfig(
        tips=n_tips, clv_buffers=tree.inner_count, states=4, sites=sites,
        rate_matrices=1, prob_matrices=2 * n_tips - 3, rate_cats=4,
        scale_buffers=tree.inner_count, dtype=jnp.float32)
    model = engine.make_model([SUBST], [FREQS], rates,
                              dtype=jnp.float32)
    prog = search_fast.compile_spr(tree, cfg, radius=3)
    cfgx = prog.cfg_ext
    tipchars = search_fast._tipchars_for(prog, chars)
    pw, inv = search_fast._aux_arrays(prog)
    bl = jnp.asarray(prog.branch_lengths, cfgx.dtype)
    lops = jnp.asarray(prog.level_ops)
    pslots = jnp.asarray(prog.pmatrix_slots)
    base = search_fast._spr_base_jit(cfgx, model, lops, pslots, bl,
                                     tipchars)

    compared = 0
    for g in prog.ball_groups:
        args = (cfgx, model, *base, bl, pw, inv,
                tuple(jnp.asarray(a) for a in g.ball_levels),
                jnp.asarray(g.score_ops), jnp.asarray(g.sub_rows),
                jnp.asarray(g.edge_pos), jnp.asarray(g.merge_edges))
        s_x, t3_x = search_fast._spr_ball_scores(
            *args, ball_slots=prog.ball_slots, newton_iters=3)
        s_k, t3_k = search_fast._spr_ball_scores(
            *args, ball_slots=prog.ball_slots, newton_iters=3,
            use_kernel=True, kernel_interpret=True)
        s_x, t3_x = np.asarray(s_x), np.asarray(t3_x)
        s_k, t3_k = np.asarray(s_k), np.asarray(t3_k)
        valid = g.score_ops[..., search_fast.BOP_VALID] == 1
        assert np.all(np.isneginf(s_k[~valid]))
        # -inf (f32 pathologies) must agree between paths; compare the
        # finite scores at f32 tolerance
        np.testing.assert_array_equal(np.isneginf(s_k[valid]),
                                      np.isneginf(s_x[valid]))
        fin = valid & np.isfinite(s_x) & np.isfinite(s_k)
        assert fin.sum() > 10, int(fin.sum())
        rel = np.abs(s_k[fin] - s_x[fin]) / np.maximum(1.0, np.abs(s_x[fin]))
        assert rel.max() < 2e-5, rel.max()
        np.testing.assert_allclose(t3_k[fin], t3_x[fin], rtol=2e-3,
                                   atol=2e-5)
        compared += int(fin.sum())
    assert compared > 30
