"""Multi-host runtime helpers on the CI virtual 8-device CPU mesh (the
single-process degenerate case of the pod path): global-array placement
must shard the site axis, initialize() must be a harmless no-op without a
coordinator, and the jitted engine must produce the identical logL on
globally-sharded inputs (exactness of per-site weighted sums under
sharding, SURVEY.md §2.6)."""
import jax
import jax.numpy as jnp
import numpy as np

import libpll2_tpu as pll
from libpll2_tpu import engine
from libpll2_tpu import tree as T
from libpll2_tpu.config import PartitionConfig
from libpll2_tpu.parallel import distributed as D

from .test_parity_tree import random_newick, random_seqs


def test_initialize_noop_single_process():
    assert D.initialize() == 1
    assert jax.process_count() == 1


def test_global_mesh_and_placement():
    mesh = D.global_site_mesh()
    assert mesh.devices.size == 8
    arr = np.arange(8 * 128 * 2, dtype=np.float32).reshape(2, 8 * 128)
    g = D.make_global_site_array(mesh, arr)
    assert g.shape == arr.shape
    np.testing.assert_array_equal(np.asarray(g), arr)
    shard_shapes = {s.data.shape for s in g.addressable_shards}
    assert shard_shapes == {(2, 128)}
    sl = D.process_site_slice(8 * 128, mesh)
    assert (sl.start, sl.stop) == (0, 8 * 128)


def test_sharded_engine_logl_identical():
    rng = np.random.default_rng(31)
    n_tips, sites = 12, 8 * 128          # exactly one block per device
    newick = random_newick(n_tips, rng)
    seqs = random_seqs(n_tips, sites, rng)
    tree = T.parse_newick_string(newick)
    cfg = PartitionConfig(
        tips=n_tips, clv_buffers=tree.inner_count, states=4, sites=sites,
        rate_matrices=1, prob_matrices=2 * n_tips - 3, rate_cats=4,
        scale_buffers=tree.inner_count, dtype=jnp.float64)
    program = engine.compile_tree(tree, cfg)
    model = engine.make_model(
        [[1.2, 2.1, 0.7, 1.3, 2.5, 1.0]], [[0.3, 0.25, 0.2, 0.25]],
        pll.compute_gamma_cats(0.8, 4), dtype=jnp.float64)
    raw = np.zeros((n_tips, cfg.sites), dtype=np.uint64)
    for i, s in enumerate(seqs):
        raw[i] = pll.MAP_NT[np.frombuffer(s.encode(), np.uint8)]
    tipchars = engine.pad_tipchars(raw, cfg)
    pw = np.zeros(cfg.sites_padded)
    pw[:sites] = 1.0
    inv = np.full(cfg.sites_padded, -1, np.int32)
    bl = jnp.asarray(program.default_branch_lengths, jnp.float64)

    plain = float(engine.loglikelihood(
        program, cfg, model, bl, jnp.asarray(tipchars),
        jnp.asarray(pw), jnp.asarray(inv)))

    mesh = D.global_site_mesh()
    tc_g, pw_g, inv_g = D.shard_engine_inputs(mesh, tipchars, pw, inv)
    sharded = float(engine.loglikelihood(
        program, cfg, model, bl, tc_g, pw_g, inv_g))
    np.testing.assert_allclose(sharded, plain, rtol=1e-12)
