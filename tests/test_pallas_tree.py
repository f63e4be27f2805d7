"""VMEM-resident Pallas tree sweep (interpret mode) must agree with the XLA
einsum path on the exported root rows — the kernel-variant parity matrix of
the reference (test/runtest.py) applied to the fastest TPU path."""
import jax.numpy as jnp
import numpy as np
import pytest

import libpll2_tpu as pll
from libpll2_tpu import engine
from libpll2_tpu import tree as T
from libpll2_tpu.config import PartitionConfig
from libpll2_tpu.ops import partials as partials_ops
from libpll2_tpu.ops import partials_pallas_tree as ppt
from libpll2_tpu.ops import pmatrix as pmatrix_ops

from .test_parity_tree import random_newick, random_seqs


def caterpillar_newick(n):
    s = "(t0:0.1,t1:0.2)"
    for i in range(2, n - 2):
        s = f"({s}:0.05,t{i}:0.1)"
    return f"({s}:0.05,t{n-2}:0.1,t{n-1}:0.1);"


def build(newick, sites, seed, rate_cats=4, scale_heavy=False):
    rng = np.random.default_rng(seed)
    tree = T.parse_newick_string(newick)
    n_tips = tree.tip_count
    seqs = random_seqs(n_tips, sites, rng)
    cfg = PartitionConfig(
        tips=n_tips, clv_buffers=tree.inner_count, states=4, sites=sites,
        rate_matrices=1, prob_matrices=2 * n_tips - 3, rate_cats=rate_cats,
        scale_buffers=tree.inner_count, dtype=jnp.float32)
    program = engine.compile_tree(tree, cfg)
    assert program.vmem_prog is not None
    model = engine.make_model(
        [[1.2, 2.1, 0.7, 1.3, 2.5, 1.0]], [[0.3, 0.25, 0.2, 0.25]],
        pll.compute_gamma_cats(0.8, rate_cats), dtype=jnp.float32)

    raw = np.zeros((n_tips, cfg.sites_alloc), dtype=np.uint64)
    for i, s in enumerate(seqs):
        raw[i] = pll.MAP_NT[np.frombuffer(s.encode(), np.uint8)]
    tipchars = jnp.asarray(engine.pad_tipchars(raw, cfg))

    bl = program.default_branch_lengths * (30.0 if scale_heavy else 1.0)
    num_slots = int(program.pmatrix_indices.max()) + 1
    pmats = jnp.zeros((num_slots, rate_cats, 4, 4), jnp.float32)
    new = pmatrix_ops.compute_pmatrices(
        jnp.asarray(bl, jnp.float32), model.eigenvals, model.eigenvecs,
        model.inv_eigenvecs, model.rates, model.prop_invar,
        model.params_indices, dtype=jnp.float32)
    pmats = pmats.at[jnp.asarray(program.pmatrix_indices)].set(new)
    return tree, cfg, program, tipchars, pmats


def run_xla(cfg, program, tipchars, pmats):
    R, S, Tp = cfg.rate_cats, cfg.states, cfg.sites_padded
    tip_clv = engine.expand_tipchars(tipchars, S, jnp.float32)
    clv0 = jnp.zeros((cfg.num_clvs + 1, R, S, Tp), jnp.float32)
    clv0 = clv0.at[:cfg.tips].set(
        jnp.broadcast_to(tip_clv[:, None], (cfg.tips, R, S, Tp)))
    scal0 = jnp.zeros((cfg.scale_buffers + 2, Tp), jnp.int32)
    return partials_ops.update_partials(
        clv0, scal0, pmats, jnp.asarray(program.level_ops), cfg)


def run_vmem(cfg, program, tipchars, pmats, tb=128):
    prog = program.vmem_prog
    nt = cfg.sites_padded // tb
    tip_b = jnp.transpose(tipchars.astype(jnp.int32).reshape(cfg.tips, nt, tb), (1, 0, 2))
    clv_rows, scal_rows = ppt.sweep(tip_b, pmats, prog, cfg, tb,
                                    interpret=True)
    return prog, clv_rows, scal_rows


@pytest.mark.parametrize("n_tips,sites,seed", [
    (8, 256, 0),
    (24, 384, 1),
    (40, 512, 2),
])
def test_vmem_matches_xla(n_tips, sites, seed):
    rng = np.random.default_rng(seed)
    newick = random_newick(n_tips, rng)
    tree, cfg, program, tipchars, pmats = build(newick, sites, seed)
    clv_x, scal_x = run_xla(cfg, program, tipchars, pmats)
    prog, clv_rows, scal_rows = run_vmem(cfg, program, tipchars, pmats)
    for clv_idx, row in prog.export_clv_map.items():
        got = np.asarray(ppt.unblock_clv_row(clv_rows[row]))
        np.testing.assert_allclose(got, np.asarray(clv_x[clv_idx]),
                                   rtol=1e-6, atol=0)
    for scal_idx, row in prog.export_scaler_map.items():
        got = np.asarray(ppt.unblock_scaler_row(scal_rows[row]))
        np.testing.assert_array_equal(got, np.asarray(scal_x[scal_idx]))


def test_vmem_scaling_fires():
    rng = np.random.default_rng(7)
    newick = random_newick(48, rng)
    tree, cfg, program, tipchars, pmats = build(newick, 256, 7,
                                                scale_heavy=True)
    clv_x, scal_x = run_xla(cfg, program, tipchars, pmats)
    assert int(np.asarray(scal_x[:cfg.scale_buffers]).max()) > 0
    prog, clv_rows, scal_rows = run_vmem(cfg, program, tipchars, pmats)
    for scal_idx, row in prog.export_scaler_map.items():
        got = np.asarray(ppt.unblock_scaler_row(scal_rows[row]))
        np.testing.assert_array_equal(got, np.asarray(scal_x[scal_idx]))
    for clv_idx, row in prog.export_clv_map.items():
        got = np.asarray(ppt.unblock_clv_row(clv_rows[row]))
        np.testing.assert_allclose(got, np.asarray(clv_x[clv_idx]),
                                   rtol=1e-6, atol=0)


def test_vmem_caterpillar_pool_small():
    """Sethi–Ullman allocation keeps the slot pool tiny on pathological
    topologies (caterpillar: O(1); balanced: O(log n)).  On a depth-62
    chain the f32 rescue decision can flip at sites whose CLV sits within
    an ulp of the threshold — CLV×2^k and scaler+k compensate exactly — so
    the parity check compares SCALING-COMPENSATED values (the quantity the
    corrected log-likelihood consumes, core_likelihood.c:196-198)."""
    tree, cfg, program, tipchars, pmats = build(caterpillar_newick(64),
                                                256, 3)
    assert program.vmem_prog.pool_size <= 4
    clv_x, scal_x = run_xla(cfg, program, tipchars, pmats)
    prog, clv_rows, scal_rows = run_vmem(cfg, program, tipchars, pmats)
    producer = {}
    from libpll2_tpu.tree import create_operations, traverse
    ops, _, _ = create_operations(traverse(tree.vroot))
    for op in ops:
        producer[op.parent_clv_index] = op.parent_scaler_index
    for clv_idx, row in prog.export_clv_map.items():
        got = np.asarray(ppt.unblock_clv_row(clv_rows[row])).astype(
            np.float64)
        want = np.asarray(clv_x[clv_idx]).astype(np.float64)
        srow = producer[clv_idx]
        sg = np.asarray(ppt.unblock_scaler_row(
            scal_rows[prog.export_scaler_map[srow]])).astype(np.float64)
        sw = np.asarray(scal_x[srow]).astype(np.float64)
        got *= 2.0 ** (-30.0 * sg)[None, None, :]
        want *= 2.0 ** (-30.0 * sw)[None, None, :]
        np.testing.assert_allclose(got, want, rtol=2e-3, atol=0)


@pytest.mark.parametrize("precision", ["highest", "default"])
def test_static_protein_matches_xla(precision):
    """Wide state spaces (protein, span = 80) on the static kernel
    (contraction depths beyond 128 chunk fine on the MXU).  Also
    exercises the Q-tip padding at parts*S = 60 -> 64."""
    import dataclasses
    rng = np.random.default_rng(5)
    n_tips, sites = 12, 256
    newick = random_newick(n_tips, rng)
    tree = T.parse_newick_string(newick)
    aas = "ARNDCQEGHILKMFPSTWYV"
    seqs = ["".join(rng.choice(list(aas), sites)) for _ in range(n_tips)]
    cfg = PartitionConfig(
        tips=n_tips, clv_buffers=tree.inner_count, states=20, sites=sites,
        rate_matrices=1, prob_matrices=2 * n_tips - 3, rate_cats=4,
        scale_buffers=tree.inner_count, dtype=jnp.float32,
        pallas_precision=precision)
    program = engine.compile_tree(tree, cfg)
    from libpll2_tpu.models.aa import aa_model
    lg_rates, lg_freqs = aa_model("lg")
    model = engine.make_model(
        [lg_rates], [lg_freqs],
        pll.compute_gamma_cats(0.8, 4), dtype=jnp.float32)
    raw = np.zeros((n_tips, sites), dtype=np.uint64)
    for i, s in enumerate(seqs):
        raw[i] = pll.MAP_AA[np.frombuffer(s.encode(), np.uint8)]
    tipchars = jnp.asarray(engine.pad_tipchars(raw, cfg))
    num_slots = int(program.pmatrix_indices.max()) + 1
    pmats = jnp.zeros((num_slots, 4, 20, 20), jnp.float32)
    new = pmatrix_ops.compute_pmatrices(
        jnp.asarray(program.default_branch_lengths, jnp.float32),
        model.eigenvals, model.eigenvecs, model.inv_eigenvecs,
        model.rates, model.prop_invar, model.params_indices,
        dtype=jnp.float32)
    pmats = pmats.at[jnp.asarray(program.pmatrix_indices)].set(new)

    choice = ppt.choose(program.vmem_prog, cfg, num_slots)
    assert choice is not None and choice[1] == "static"

    clv_x, scal_x = run_xla(cfg, program, tipchars, pmats)
    tb = 128
    nt = cfg.sites_padded // tb
    tip_b = jnp.transpose(
        tipchars.astype(jnp.int32).reshape(cfg.tips, nt, tb), (1, 0, 2))
    clv_rows, scal_rows = ppt.sweep_static(tip_b, pmats,
                                           program.vmem_prog, cfg, tb,
                                           interpret=True)
    prog = program.vmem_prog
    rtol = {"highest": 2e-6, "default": 8e-2}[precision]
    for clv_idx, row in prog.export_clv_map.items():
        got = np.asarray(ppt.unblock_clv_row(clv_rows[row]))
        np.testing.assert_allclose(got, np.asarray(clv_x[clv_idx]),
                                   rtol=rtol, atol=0)
    if precision == "highest":
        for scal_idx, row in prog.export_scaler_map.items():
            got = np.asarray(ppt.unblock_scaler_row(scal_rows[row]))
            np.testing.assert_array_equal(got, np.asarray(scal_x[scal_idx]))


def test_bf16_splits_bit_domain():
    """The split parts must be computed with integer-domain rounding:
    XLA:TPU runs with excess precision allowed and may elide a lossy
    f32->bf16->f32 convert pair as identity, zeroing every residual part
    (observed on-chip as a 2^-8 CLV error).  Pin (a) round-to-nearest-even
    agreement with the convert, (b) exact reconstruction to f32 accuracy,
    (c) non-trivial residuals."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(4096).astype(np.float32)
                    * np.exp(rng.uniform(-20, 3, 4096)).astype(np.float32))
    parts = ppt._bf16_splits(x, 3)
    np.testing.assert_array_equal(
        np.asarray(parts[0]), np.asarray(x.astype(jnp.bfloat16)))
    total = sum(np.asarray(p, np.float64) for p in parts)
    err = np.abs(total - np.asarray(x, np.float64))
    assert float(np.max(err / np.maximum(np.abs(np.asarray(x)), 1e-30))) \
        < 2 ** -22
    assert float(np.abs(np.asarray(parts[1])).max()) > 0
    assert float(np.abs(np.asarray(parts[2])).max()) > 0


def test_schedule_rejects_non_forest():
    from libpll2_tpu.partition import Operation
    # child 5 never produced and not a tip -> partial traversal -> None
    ops = [Operation(6, 0, 5, 0, 1, 0, -1, -1)]
    assert ppt.schedule(ops, tips=4, export_clvs=[6]) is None


def test_balanced_pool_logarithmic():
    from libpll2_tpu.tree.generate import balanced_newick
    tree = T.parse_newick_string(balanced_newick(256))
    cfg = PartitionConfig(
        tips=256, clv_buffers=tree.inner_count, states=4, sites=256,
        rate_matrices=1, prob_matrices=509, rate_cats=4,
        scale_buffers=tree.inner_count, dtype=jnp.float32)
    program = engine.compile_tree(tree, cfg)
    assert program.vmem_prog.pool_size <= 12


@pytest.mark.parametrize("precision", ["highest", "high", "default"])
def test_splitk_matches_xla(precision):
    """Split-K mode: all precision-term stacks agree with the f32 XLA
    path to their stated quality (scalers bit-equal; CLVs compared
    relative to each site's magnitude — tiny components of a CLV can
    differ at bf16 granularity without affecting any likelihood)."""
    import dataclasses
    rng = np.random.default_rng(11)
    newick = random_newick(24, rng)
    tree, cfg, program, tipchars, pmats = build(newick, 384, 11)
    cfg = dataclasses.replace(cfg, pallas_precision=precision)
    clv_x, scal_x = run_xla(cfg, program, tipchars, pmats)
    prog = program.vmem_prog
    tb = 128
    nt = cfg.sites_padded // tb
    tip_b = jnp.transpose(
        tipchars.astype(jnp.int32).reshape(cfg.tips, nt, tb), (1, 0, 2))
    clv_rows, scal_rows = ppt.sweep(tip_b, pmats, prog, cfg, tb,
                                    mode="splitk", interpret=True)
    tol = {"highest": 5e-6, "high": 2e-4, "default": 6e-2}[precision]
    for clv_idx, row in prog.export_clv_map.items():
        got = np.asarray(ppt.unblock_clv_row(clv_rows[row])).astype(
            np.float64)
        want = np.asarray(clv_x[clv_idx]).astype(np.float64)
        mag = np.maximum(np.max(want, axis=(0, 1), keepdims=True), 1e-300)
        assert float(np.max(np.abs(got - want) / mag)) < tol
    if precision == "highest":
        for sidx, row in prog.export_scaler_map.items():
            got = np.asarray(ppt.unblock_scaler_row(scal_rows[row]))
            np.testing.assert_array_equal(got, np.asarray(scal_x[sidx]))


def test_choose_prefers_static():
    tree, cfg, program, tipchars, pmats = build(caterpillar_newick(16),
                                                256, 0)
    choice = ppt.choose(program.vmem_prog, cfg,
                        int(program.pmatrix_indices.max()) + 1)
    assert choice is not None and choice[1] == "static"
    # beyond the single-program unroll cap the SEGMENTED static kernel
    # takes over; beyond its cap too, the runtime-ops kernel wins
    orig, orig_seg = ppt.STATIC_MAX_OPS, ppt.STATIC_SEG_MAX_OPS
    try:
        ppt.STATIC_MAX_OPS = 0
        choice = ppt.choose(program.vmem_prog, cfg,
                            int(program.pmatrix_indices.max()) + 1)
        assert choice is not None and choice[1] == "static-seg"
        ppt.STATIC_SEG_MAX_OPS = 0
        choice = ppt.choose(program.vmem_prog, cfg,
                            int(program.pmatrix_indices.max()) + 1)
        assert choice is not None and choice[1] == "splitk"
    finally:
        ppt.STATIC_MAX_OPS, ppt.STATIC_SEG_MAX_OPS = orig, orig_seg


# --------------------------------------------------------------------------
# topology-specialized (static) kernel
# --------------------------------------------------------------------------

@pytest.mark.parametrize("per_rate", [False, True])
@pytest.mark.parametrize("precision", ["highest", "high", "default"])
def test_static_matches_xla(per_rate, precision):
    import dataclasses
    rng = np.random.default_rng(3)
    newick = random_newick(24, rng)
    tree, cfg, program, tipchars, pmats = build(newick, 384, 3,
                                                scale_heavy=True)
    cfg = dataclasses.replace(cfg, per_rate_scalers=per_rate,
                              pallas_precision=precision)

    # XLA reference sweep in the matching scaler mode
    R, S, Tp = cfg.rate_cats, cfg.states, cfg.sites_padded
    tip_clv = engine.expand_tipchars(tipchars, S, jnp.float32)
    clv0 = jnp.zeros((cfg.num_clvs + 1, R, S, Tp), jnp.float32)
    clv0 = clv0.at[:cfg.tips].set(
        jnp.broadcast_to(tip_clv[:, None], (cfg.tips, R, S, Tp)))
    if per_rate:
        scal0 = jnp.zeros((cfg.scale_buffers + 2, R, Tp), jnp.int32)
    else:
        scal0 = jnp.zeros((cfg.scale_buffers + 2, Tp), jnp.int32)
    clv_x, scal_x = partials_ops.update_partials(
        clv0, scal0, pmats, jnp.asarray(program.level_ops), cfg)

    prog = program.vmem_prog
    tb = 128
    nt = cfg.sites_padded // tb
    tip_b = jnp.transpose(
        tipchars.astype(jnp.int32).reshape(cfg.tips, nt, tb), (1, 0, 2))
    clv_rows, scal_rows = ppt.sweep_static(tip_b, pmats, prog, cfg, tb,
                                           interpret=True)
    rtol = {"highest": 1e-6, "high": 2e-4, "default": 8e-2}[precision]
    for clv_idx, row in prog.export_clv_map.items():
        got = np.asarray(ppt.unblock_clv_row(clv_rows[row]))
        np.testing.assert_allclose(got, np.asarray(clv_x[clv_idx]),
                                   rtol=rtol, atol=0)
    if precision != "highest":
        return  # scaler counts can legitimately differ at reduced precision
    for scal_idx, row in prog.export_scaler_map.items():
        got = np.asarray(ppt.unblock_scaler_row(scal_rows[row]))
        np.testing.assert_array_equal(got, np.asarray(scal_x[scal_idx]))


@pytest.mark.parametrize("per_rate", [False, True])
def test_static_segmented_matches_static(per_rate):
    """The segmented static kernel (carry slabs across pallas_call
    boundaries) must reproduce the single-program static sweep
    BIT-EXACTLY: carried children re-enter as the same bf16 stacked
    parts the pool held, so op math is identical."""
    import dataclasses
    rng = np.random.default_rng(9)
    newick = random_newick(40, rng)
    tree, cfg, program, tipchars, pmats = build(newick, 256, 9,
                                                scale_heavy=True)
    cfg = dataclasses.replace(cfg, per_rate_scalers=per_rate)
    prog = program.vmem_prog
    tb = 128
    nt = cfg.sites_padded // tb
    tip_b = jnp.transpose(
        tipchars.astype(jnp.int32).reshape(cfg.tips, nt, tb), (1, 0, 2))

    want_clv, want_scal = ppt.sweep_static(tip_b, pmats, prog, cfg, tb,
                                           interpret=True)

    # force segmentation (38 ops at 8 ops/segment -> 5 segments) and
    # run the SAME seg_ops through the sweep so the carry DMA path is
    # genuinely exercised (the default SEG_OPS keeps 38 ops in ONE
    # segment, which compares nothing)
    sprog = ppt.segment_static(prog, seg_ops=8)
    assert len(sprog.segments) >= 4
    assert any(s.carry_in for s in sprog.segments[1:])
    got_clv, got_scal = ppt.sweep_static_segmented(
        tip_b, pmats, prog, cfg, tb, interpret=True, seg_ops=8)

    np.testing.assert_array_equal(np.asarray(got_clv),
                                  np.asarray(want_clv))
    np.testing.assert_array_equal(np.asarray(got_scal),
                                  np.asarray(want_scal))
