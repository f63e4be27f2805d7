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
    scalar-prefetch array [OPS, 8]; grid = (OPS, NT), site-block index
    innermost.
  * CLVs live in HBM in SITE-BLOCKED layout [N, NT, R, S, TB] (T = NT*TB):
    one op's (row, site-block) slab is a single CONTIGUOUS R*S*TB*4-byte
    chunk, so every child read / parent write is one max-bandwidth DMA —
    no strided descriptors.  The engine builds tip CLVs directly in this
    layout and transposes back only the two rows the logL reduction needs.
  * The CLV tensor is aliased input->output: each grid step DMAs the two
    child slabs into VMEM, computes the parent slab on the VPU (S
    broadcast-fmas per child — no MXU, no sublane shuffles), and DMAs it
    out.  Double-buffered (in-flight window of one grid step each way).
  * Scalers ride as [Z, NT, 1, TB] int32; the underflow test (all R*S
    entries < threshold -> multiply by factor, increment counter,
    counter = left + right + rescue) runs in-register.

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


def to_blocked(clv, tb: int):
    """[N, R, S, T] -> [N, NT, R, S, TB] (transpose; test helper — the
    engine builds the blocked layout directly)."""
    N1, R, S, T = clv.shape
    return clv.reshape(N1, R, S, T // tb, tb).transpose(0, 3, 1, 2, 4)


def from_blocked(clv_b):
    """[N, NT, R, S, TB] -> [N, R, S, T]."""
    N1, NT, R, S, TB = clv_b.shape
    return clv_b.transpose(0, 2, 3, 1, 4).reshape(N1, R, S, NT * TB)


def _sweep_kernel(ops_ref,                 # [OPS, 8] int32 (scalar prefetch)
                  p1_ref, p2_ref,          # [1, R, S, S] VMEM blocks
                  clv_in, scal_in,         # HBM (aliased; unused as inputs)
                  clv_ref, scal_ref,       # HBM refs (aliased outputs)
                  cbuf, obuf, sibuf, sobuf,
                  in_sems, out_sems,
                  *, nt: int, states: int,
                  thresh: float, factor: float):
    del clv_in, scal_in
    w = pl.program_id(0)
    t = pl.program_id(1)
    total = pl.num_programs(0) * nt
    u = w * nt + t
    slot = u % 2

    def in_copies(uu, sl):
        ww = uu // nt
        tt = uu % nt
        return (
            pltpu.make_async_copy(clv_ref.at[ops_ref[ww, 1], tt],
                                  cbuf.at[sl, 0], in_sems.at[sl, 0]),
            pltpu.make_async_copy(clv_ref.at[ops_ref[ww, 2], tt],
                                  cbuf.at[sl, 1], in_sems.at[sl, 1]),
            pltpu.make_async_copy(scal_ref.at[ops_ref[ww, 6], tt],
                                  sibuf.at[sl, 0], in_sems.at[sl, 2]),
            pltpu.make_async_copy(scal_ref.at[ops_ref[ww, 7], tt],
                                  sibuf.at[sl, 1], in_sems.at[sl, 3]),
        )

    def out_copies(uu, sl):
        ww = uu // nt
        tt = uu % nt
        return (
            pltpu.make_async_copy(obuf.at[sl],
                                  clv_ref.at[ops_ref[ww, 0], tt],
                                  out_sems.at[sl, 0]),
            pltpu.make_async_copy(sobuf.at[sl],
                                  scal_ref.at[ops_ref[ww, 5], tt],
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

    p1 = p1_ref[0]                     # [R, S, S]
    p2 = p2_ref[0]
    c1 = cbuf[slot, 0]                 # [R, S, TB]
    c2 = cbuf[slot, 1]
    left = p1[:, :, 0:1] * c1[:, 0:1, :]
    right = p2[:, :, 0:1] * c2[:, 0:1, :]
    for j in range(1, states):
        left += p1[:, :, j:j + 1] * c1[:, j:j + 1, :]
        right += p2[:, :, j:j + 1] * c2[:, j:j + 1, :]
    parent = left * right              # [R, S, TB]

    # counter-based underflow rescue (per site, all rates+states below)
    mask = jnp.all(parent < thresh, axis=(0, 1), keepdims=True)  # [1,1,TB]
    parent = jnp.where(mask, parent * factor, parent)
    snew = sibuf[slot, 0] + sibuf[slot, 1] + mask[0].astype(jnp.int32)

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


@functools.partial(jax.jit, static_argnames=("cfg", "interpret"))
def update_partials_blocked(clv_b, scal_b, pmatrix, flat_ops,
                            cfg: PartitionConfig,
                            interpret: bool = False):
    """CLV sweep over SITE-BLOCKED buffers (the engine's native layout).

    clv_b:    [N+1, NT, R, S, TB]
    scal_b:   [Z+2, NT, 1, TB] int32
    pmatrix:  [P, R, S, S]
    flat_ops: [OPS, 8] int32, level order (partition.flatten_level_ops)
    """
    n_ops = flat_ops.shape[0]
    if n_ops == 0:
        return clv_b, scal_b
    N1, nt, R, S, tb = clv_b.shape
    assert nt >= MIN_NT, (nt, tb)

    p1 = pmatrix[flat_ops[:, 3]]       # [OPS, R, S, S] — tiny gathers
    p2 = pmatrix[flat_ops[:, 4]]

    kernel = functools.partial(
        _sweep_kernel, nt=nt, states=S,
        thresh=cfg.scale_threshold, factor=cfg.scale_factor)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_ops, nt),
        in_specs=[
            pl.BlockSpec((1, R, S, S), lambda w, t, ops: (w, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, R, S, S), lambda w, t, ops: (w, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, R, S, tb), cfg.dtype),   # child slabs
            pltpu.VMEM((2, R, S, tb), cfg.dtype),      # parent slab
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
            jax.ShapeDtypeStruct(clv_b.shape, clv_b.dtype),
            jax.ShapeDtypeStruct(scal_b.shape, scal_b.dtype),
        ),
        # operand order: ops(0) p1(1) p2(2) clv(3) scalers(4)
        input_output_aliases={3: 0, 4: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=n_ops * R * S * nt * tb * (4 * S + 1),
            bytes_accessed=n_ops * R * S * nt * tb
            * clv_b.dtype.itemsize * 3,
            transcendentals=0,
        ),
        interpret=interpret,
    )(flat_ops, p1, p2, clv_b, scal_b)
    return clv_out, scal_out


@functools.partial(jax.jit, static_argnames=("cfg", "tb", "interpret"))
def update_partials_flat(clv, scalers, pmatrix, flat_ops,
                         cfg: PartitionConfig, tb: int,
                         interpret: bool = False):
    """Standard-layout wrapper (tests; the engine uses the blocked form).

    clv: [N+1, R, S, T]; scalers: [Z+2, T] int32.
    """
    N1, R, S, T = clv.shape
    nt = T // tb
    assert nt >= MIN_NT and T % tb == 0, (nt, T, tb)
    clv_b = to_blocked(clv, tb)
    scal_b = scalers.reshape(scalers.shape[0], nt, 1, tb)
    clv_b, scal_b = update_partials_blocked(clv_b, scal_b, pmatrix,
                                            flat_ops, cfg,
                                            interpret=interpret)
    return from_blocked(clv_b), scal_b.reshape(scalers.shape[0], T)
