"""Pallas TPU kernel for the CLV update sweep — the hottest loop of the
framework (Felsenstein pruning, reference semantics
libpll-2 src/core_partials.c:612-765 + scaling src/pll.h:96-104).

Why a hand-written kernel: the XLA path (ops/partials.py) executes each
tree level as gather + einsum + scatter over the dense CLV tensor
[N, R, S, T].  XLA materializes the gathered children and re-writes the
whole CLV carry per level, and level-padding no-op rows cost full-size
traffic.  The sweep is bandwidth-bound (8 flops/byte read), so the ceiling
is HBM: exactly (2 reads + 1 write) x R x S x T x 4B per operation.

Kernel design (one pallas_call for the WHOLE traversal):

  * The level-ordered operation list is passed FLAT (no padding) as a
    scalar-prefetch array [OPS, 8]; grid = (OPS, T // TB), site-block
    index innermost.
  * CLVs are viewed as [N, R*S, T]: the fused rate-state axis fills whole
    f32 sublane tiles (R*S = 16 for DNA+4 rates -> two full (8,128) tiles),
    so child/parent DMAs move no padding.  The per-op contraction becomes
    ONE [RS, RS] x [RS, TB] matmul against a block-diagonal expansion of
    the rate-wise P-matrices (built by XLA outside the kernel).
  * The CLV tensor stays in HBM (memory_space=ANY) and is aliased
    input->output: each grid step manually DMAs the two child blocks
    [RS, TB] into VMEM, computes the parent block, and DMAs it back out
    to the parent row.  Double-buffered (in-flight window of one grid
    step each way).
  * Scalers ride as [Z, 1, T] (so row slices don't cut sublane tiling);
    the underflow test (all R*S entries < threshold -> multiply by factor,
    increment counter, counter = left + right + rescue) runs in-register.

Correctness of the flat (level-barrier-free) schedule: grid steps execute
sequentially on the TPU core; the only reordering is the +/-1-step DMA
overlap window.  A child row written by op s can only be read by an op
s' > s.  For s' = s+1 the overlapping transfers touch site blocks
(t in {NT-2, NT-1}) vs (t in {0, 1}) — disjoint whenever NT >= 4, which
`supported()` enforces (smaller cases use the XLA path).  For s' > s+1
the write completed at least NT-2 grid steps earlier.

f32/bf16 only (TPU has no f64); the f64 parity path stays on XLA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import PartitionConfig

MIN_NT = 4  # minimum site blocks for the hazard-free flat schedule


def pick_site_block(sites_padded: int, target: int = 4096) -> int:
    """Largest multiple-of-128 block <= target dividing sites_padded, such
    that at least MIN_NT blocks cover the site axis; 0 if impossible."""
    best = 0
    for tb in range(128, min(target, sites_padded // MIN_NT) + 1, 128):
        if sites_padded % tb == 0:
            best = tb
    return best


def supported(cfg: PartitionConfig) -> bool:
    if cfg.per_rate_scalers:
        return False
    if cfg.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    return pick_site_block(cfg.sites_padded) >= 128


def block_diag_pmatrix(p):
    """[..., R, S, S] -> [..., R*S, R*S] block-diagonal (rate-wise blocks)."""
    R, S = p.shape[-3], p.shape[-1]
    eye = jnp.eye(R, dtype=p.dtype)
    # bd[..., r, i, q, j] = eye[r, q] * P[..., r, i, j]
    full = jnp.einsum("rq,...rij->...riqj", eye, p)
    return full.reshape(*p.shape[:-3], R * S, R * S)


def diag_coefficients(p):
    """[..., R, S, S] -> [..., 2S-1, R*S] wrapped-diagonal coefficients.

    coef[..., d, k] = BD[..., k, (k + d - (S-1)) mod RS] where BD is the
    block-diagonal expansion: the per-op matvec becomes
        out[k] = sum_d coef[d, k] * roll(clv, -(d-(S-1)), axis=0)[k]
    — 2S-1 VPU fused multiply-adds over full sublane tiles, no MXU.
    Only offsets |d-(S-1)| <= S-1 can be nonzero for block-diagonal BD.
    """
    R, S = p.shape[-3], p.shape[-1]
    RS = R * S
    bd = block_diag_pmatrix(p)                      # [..., RS, RS]
    k = np.arange(RS)
    cols = (k[None, :] + np.arange(-(S - 1), S)[:, None]) % RS  # [2S-1, RS]
    return bd[..., k[None, :], cols]                # [..., 2S-1, RS]


def _sweep_kernel(ops_ref,                 # [OPS, 8] int32 (scalar prefetch)
                  p1_ref, p2_ref,          # [1, 2S-1, RS] diag-coef blocks
                  clv_in, scal_in,         # HBM (aliased; unused as inputs)
                  clv_ref, scal_ref,       # HBM refs (aliased outputs)
                  cbuf, obuf, sibuf, sobuf,
                  in_sems, out_sems,
                  *, nt: int, tb: int, states: int,
                  thresh: float, factor: float):
    del clv_in, scal_in
    w = pl.program_id(0)
    t = pl.program_id(1)
    total = pl.num_programs(0) * nt
    u = w * nt + t
    slot = u % 2

    def in_copies(uu, sl):
        ww = uu // nt
        off = (uu % nt) * tb
        return (
            pltpu.make_async_copy(
                clv_ref.at[ops_ref[ww, 1], :, pl.ds(off, tb)],
                cbuf.at[sl, 0], in_sems.at[sl, 0]),
            pltpu.make_async_copy(
                clv_ref.at[ops_ref[ww, 2], :, pl.ds(off, tb)],
                cbuf.at[sl, 1], in_sems.at[sl, 1]),
            pltpu.make_async_copy(
                scal_ref.at[ops_ref[ww, 6], :, pl.ds(off, tb)],
                sibuf.at[sl, 0], in_sems.at[sl, 2]),
            pltpu.make_async_copy(
                scal_ref.at[ops_ref[ww, 7], :, pl.ds(off, tb)],
                sibuf.at[sl, 1], in_sems.at[sl, 3]),
        )

    def out_copies(uu, sl):
        ww = uu // nt
        off = (uu % nt) * tb
        return (
            pltpu.make_async_copy(
                obuf.at[sl], clv_ref.at[ops_ref[ww, 0], :, pl.ds(off, tb)],
                out_sems.at[sl, 0]),
            pltpu.make_async_copy(
                sobuf.at[sl],
                scal_ref.at[ops_ref[ww, 5], :, pl.ds(off, tb)],
                out_sems.at[sl, 1]),
        )

    @pl.when(u == 0)
    def _prologue():
        for c in in_copies(0, 0):
            c.start()

    @pl.when(u + 1 < total)
    def _prefetch():
        for c in in_copies(u + 1, 1 - slot):
            c.start()

    for c in in_copies(u, slot):
        c.wait()

    # per-child matvec as 2S-1 diagonal-roll VPU fmas (full sublane tiles)
    c1 = cbuf[slot, 0]                                  # [RS, TB]
    c2 = cbuf[slot, 1]
    p1 = p1_ref[0]                                      # [2S-1, RS]
    p2 = p2_ref[0]
    rs = c1.shape[0]
    left = p1[0][:, None] * pltpu.roll(c1, states - 1, 0)
    right = p2[0][:, None] * pltpu.roll(c2, states - 1, 0)
    for d in range(1, 2 * states - 1):
        shift = (states - 1 - d) % rs                   # static, >= 0
        left += p1[d][:, None] * pltpu.roll(c1, shift, 0)
        right += p2[d][:, None] * pltpu.roll(c2, shift, 0)
    parent = left * right                               # [RS, TB]

    # counter-based underflow rescue (per site, all rates+states below)
    mask = jnp.all(parent < thresh, axis=0, keepdims=True)       # [1, TB]
    parent = jnp.where(mask, parent * factor, parent)
    snew = sibuf[slot, 0] + sibuf[slot, 1] + mask.astype(jnp.int32)

    # before overwriting this slot's out buffers, drain step u-2's writes
    @pl.when(u >= 2)
    def _drain():
        for c in out_copies(u - 2, slot):
            c.wait()

    obuf[slot] = parent
    sobuf[slot] = snew
    for c in out_copies(u, slot):
        c.start()

    @pl.when(u == total - 1)
    def _epilogue():
        @pl.when(total >= 2)
        def _():
            for c in out_copies(u - 1, 1 - slot):
                c.wait()
        for c in out_copies(u, slot):
            c.wait()


@functools.partial(jax.jit,
                   static_argnames=("cfg", "tb", "interpret"))
def update_partials_flat(clv, scalers, pmatrix, flat_ops,
                         cfg: PartitionConfig, tb: int,
                         interpret: bool = False):
    """Run the whole CLV sweep as one Pallas program.

    clv:      [N+1, R, S, T]   (T = cfg.sites_padded, divisible by tb)
    scalers:  [Z+2, T] int32
    pmatrix:  [P, R, S, S]
    flat_ops: [OPS, 8] int32, level order (partition.flatten_level_ops)
    """
    n_ops = flat_ops.shape[0]
    if n_ops == 0:
        return clv, scalers
    N1, R, S, T = clv.shape
    RS = R * S  # noqa: N806
    nt = T // tb
    assert nt >= MIN_NT and T % tb == 0, (nt, T, tb)

    # fused rate-state sublane axis: full (8,128) tiles, padding-free DMAs
    clv2 = clv.reshape(N1, RS, T)
    # scalers ride as [Z, 1, T]: row slices must not cut the sublane tiling
    scalers3 = scalers[:, None, :]

    p1 = diag_coefficients(pmatrix[flat_ops[:, 3]])    # [OPS, 2S-1, RS]
    p2 = diag_coefficients(pmatrix[flat_ops[:, 4]])

    kernel = functools.partial(
        _sweep_kernel, nt=nt, tb=tb, states=S,
        thresh=cfg.scale_threshold, factor=cfg.scale_factor)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_ops, nt),
        in_specs=[
            pl.BlockSpec((1, 2 * S - 1, RS), lambda w, t, ops: (w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * S - 1, RS), lambda w, t, ops: (w, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, RS, tb), cfg.dtype),     # child blocks
            pltpu.VMEM((2, RS, tb), cfg.dtype),        # parent block
            pltpu.VMEM((2, 2, 1, tb), jnp.int32),      # child scalers
            pltpu.VMEM((2, 1, tb), jnp.int32),         # parent scaler
            pltpu.SemaphoreType.DMA((2, 4)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )

    clv_out, scal_out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(clv2.shape, clv2.dtype),
            jax.ShapeDtypeStruct(scalers3.shape, scalers3.dtype),
        ),
        # operand order: ops(0) p1(1) p2(2) clv(3) scalers(4)
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=n_ops * T * (2 * RS * RS * 2 + RS),
            bytes_accessed=n_ops * RS * T * clv.dtype.itemsize * 3,
            transcendentals=0,
        ),
        interpret=interpret,
    )(flat_ops, p1, p2, clv2, scalers3)
    return clv_out.reshape(N1, R, S, T), scal_out[:, 0, :]
