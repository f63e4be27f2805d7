"""Pallas CLV sweep (interpret mode) must agree with the XLA einsum path —
the TPU analog of the reference's kernel-variant golden matrix
(test/runtest.py: CPU/SSE/AVX/AVX2 must print identical numbers)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import libpll2_tpu as pll
from libpll2_tpu import engine
from libpll2_tpu import tree as T
from libpll2_tpu.config import PartitionConfig
from libpll2_tpu.ops import partials_pallas
from libpll2_tpu.partition import flatten_level_ops

from .test_parity_tree import random_newick, random_seqs


def sweep_both_ways(n_tips, sites, seed, site_block=128, rate_cats=4,
                    scale_heavy=False):
    rng = np.random.default_rng(seed)
    newick = random_newick(n_tips, rng)
    seqs = random_seqs(n_tips, sites, rng)
    tree = T.parse_newick_string(newick)
    cfg = PartitionConfig(
        tips=n_tips, clv_buffers=tree.inner_count, states=4, sites=sites,
        rate_matrices=1, prob_matrices=2 * n_tips - 3, rate_cats=rate_cats,
        scale_buffers=tree.inner_count, dtype=jnp.float32,
        site_block=site_block)
    program = engine.compile_tree(tree, cfg)
    model = engine.make_model(
        [[1.2, 2.1, 0.7, 1.3, 2.5, 1.0]], [[0.3, 0.25, 0.2, 0.25]],
        pll.compute_gamma_cats(0.8, rate_cats), dtype=jnp.float32)

    raw = np.zeros((n_tips, cfg.sites_alloc), dtype=np.uint64)
    for i, s in enumerate(seqs):
        raw[i] = pll.MAP_NT[np.frombuffer(s.encode(), np.uint8)]
    tipchars = jnp.asarray(engine.pad_tipchars(raw, cfg))

    bl = program.default_branch_lengths * (30.0 if scale_heavy else 1.0)
    pmats = jnp.zeros((int(program.pmatrix_indices.max()) + 1,
                       rate_cats, 4, 4), jnp.float32)
    from libpll2_tpu.ops import pmatrix as pmatrix_ops
    new = pmatrix_ops.compute_pmatrices(
        jnp.asarray(bl, jnp.float32), model.eigenvals, model.eigenvecs,
        model.inv_eigenvecs, model.rates, model.prop_invar,
        model.params_indices, dtype=jnp.float32)
    pmats = pmats.at[jnp.asarray(program.pmatrix_indices)].set(new)

    R, S, Tp = rate_cats, 4, cfg.sites_padded
    tip_clv = engine.expand_tipchars(tipchars, S, jnp.float32)
    clv0 = jnp.zeros((cfg.num_clvs + 1, R, S, Tp), jnp.float32)
    clv0 = clv0.at[:cfg.tips].set(
        jnp.broadcast_to(tip_clv[:, None], (cfg.tips, R, S, Tp)))
    scal0 = jnp.zeros((cfg.scale_buffers + 2, Tp), jnp.int32)

    from libpll2_tpu.ops import partials as partials_ops
    clv_x, scal_x = partials_ops.update_partials(
        clv0, scal0, pmats, jnp.asarray(program.level_ops), cfg)

    tb = partials_pallas.pick_site_block(Tp)
    assert tb >= 128, (Tp, tb)
    clv_p, scal_p = partials_pallas.update_partials_flat(
        clv0, scal0, pmats, jnp.asarray(program.flat_ops), cfg, tb=tb,
        interpret=True)
    return cfg, clv_x, scal_x, clv_p, scal_p


@pytest.mark.parametrize("n_tips,sites,seed", [
    (8, 512, 0),
    (24, 640, 1),
    (40, 1024, 2),
])
def test_pallas_matches_xla(n_tips, sites, seed):
    cfg, clv_x, scal_x, clv_p, scal_p = sweep_both_ways(n_tips, sites, seed)
    # compare real CLV rows (scratch row excluded) and real scaler rows
    np.testing.assert_allclose(
        np.asarray(clv_p[:cfg.num_clvs]), np.asarray(clv_x[:cfg.num_clvs]),
        rtol=1e-6, atol=0)
    np.testing.assert_array_equal(
        np.asarray(scal_p[:cfg.scale_buffers + 1]),
        np.asarray(scal_x[:cfg.scale_buffers + 1]))


def test_pallas_scaling_fires():
    """Long branches + deeper tree: scaler counters must actually trigger
    and still agree between paths."""
    cfg, clv_x, scal_x, clv_p, scal_p = sweep_both_ways(
        48, 512, 7, scale_heavy=True)
    assert int(np.asarray(scal_x[:cfg.scale_buffers]).max()) > 0
    np.testing.assert_array_equal(
        np.asarray(scal_p[:cfg.scale_buffers + 1]),
        np.asarray(scal_x[:cfg.scale_buffers + 1]))
    np.testing.assert_allclose(
        np.asarray(clv_p[:cfg.num_clvs]), np.asarray(clv_x[:cfg.num_clvs]),
        rtol=1e-6, atol=0)


def test_flat_ops_level_order():
    rng = np.random.default_rng(5)
    tree = T.parse_newick_string(random_newick(16, rng))
    cfg = PartitionConfig(
        tips=16, clv_buffers=tree.inner_count, states=4, sites=128,
        rate_matrices=1, prob_matrices=29, rate_cats=4,
        scale_buffers=tree.inner_count)
    trav = T.traverse(tree.vroot)
    ops, _, _ = T.create_operations(trav)
    flat = flatten_level_ops(ops, cfg)
    assert flat.shape == (len(ops), 8)
    # every child must be a tip or appear as a parent EARLIER in the list
    seen = set(range(cfg.tips))
    for row in flat:
        assert row[1] in seen and row[2] in seen
        seen.add(int(row[0]))
