"""VMEM-resident Pallas tree sweep — the fastest CLV path.

A streaming sweep is HBM-bound: every operation moves (2 reads + 1
write) x R x S x T x 4B through HBM, because each CLV row round-trips to
HBM between levels (the XLA einsum path behaves this way).  But the Felsenstein recursion
(reference libpll-2 src/core_partials.c:612-765) over ONE site block is a
tree-structured expression whose live set, under Sethi–Ullman evaluation
order, is O(depth) slabs — a few hundred KB.  So the whole traversal for a
site block fits in VMEM:

  * grid = (NT, OPS): site-block outermost, operation innermost.  Within a
    block, every inner CLV slab [R, S, TB] lives in a VMEM slot pool;
    slots are assigned host-side (schedule()) by a register-allocation
    pass that orders each node's heavier subtree first and recycles slots
    the moment a child is consumed.  Max pool size is O(log n) for any
    binary tree, asserted against the VMEM budget.
  * Tips never materialize as CLVs in HBM at all: the packed state
    bitmasks ([tips, NT, TB] int32 — 4B/site instead of R*S*4B/site) are
    auto-pipelined into VMEM once per block and bit-expanded to 0/1
    CLVs in registers (pll.c:959-1024 semantics, SURVEY.md §8.3#4).
  * P-matrices ([P, R, S, S], a few hundred KB) are VMEM-resident for the
    whole sweep.
  * Only rows a consumer needs (the root edge's CLVs + scalers for the
    logL / derivative reductions) are DMA'd back to HBM, once per block.

HBM traffic: tips x NT x TB x 4B + exports — ~100x less than streaming.
Underflow rescue (counters, pll.h:96-104) is identical to the other
kernels: per-site all-below-threshold test, parent counter = left + right
+ rescue, carried in an int32 slot pool.

Three kernel modes (choose() picks):
  * "splitk" (preferred): ONE MXU pass per child at any precision by
    stacking the bf16 decomposition terms of an f32 product along the
    MXU's free contraction axis (see the SPLIT_TERMS comment) — measured
    ~1.4x the 6-pass mode at identical f32 quality, and the kernel
    becomes VMEM-bandwidth-bound rather than MXU-bound;
  * "mxu": rate-block-diagonal [span, span] matmuls at the XLA precision
    setting (multi-pass) — used when the split stack exceeds 128 rows
    (wide state spaces);
  * "vpu": broadcast-FMA form, no MXU — small-problem fallback.

f32/bf16 only (TPU has no f64); the f64 parity path stays on XLA.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import PartitionConfig

HIGHEST = jax.lax.Precision.HIGHEST

PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,
    "high": jax.lax.Precision.HIGH,
    "default": jax.lax.Precision.DEFAULT,
}

OP_COLS = 9
# columns: 0 parent_slot, 1 c1_tip_idx, 2 c1_slot, 3 c1_is_tip,
#          4 c2_tip_idx, 5 c2_slot, 6 c2_is_tip, 7 pmatrix1, 8 pmatrix2

VMEM_BUDGET = 96 * 1024 * 1024

# caps for the unrolled (topology-specialized) kernel: compile memory and
# time scale with n_ops (superlinearly) and with site block size
STATIC_MAX_OPS = 512
STATIC_MAX_TB = 4096


@dataclasses.dataclass(frozen=True, eq=False)
class TreeVmemProgram:
    """Host-compiled slot-allocated schedule of one tree traversal.

    Hashes/compares by CONTENT so jit caches hit when the same topology
    is recompiled (SPR rounds revisit topologies constantly)."""
    ops: np.ndarray                    # [OPS, 9] int32
    pool_size: int
    exports: tuple                     # ((op_index, slot), ...) row-ordered
    export_clv_map: dict               # clv_index -> export row
    export_scaler_map: dict            # scaler_index -> export row
    _hash: int = dataclasses.field(default=None, compare=False, repr=False)

    @property
    def n_ops(self) -> int:
        return self.ops.shape[0]

    def _content_key(self):
        vals = []
        for f in dataclasses.fields(self):
            if f.name.startswith("_"):
                continue
            v = getattr(self, f.name)
            if isinstance(v, np.ndarray):
                vals.append((f.name, v.shape, str(v.dtype),
                             v.tobytes()))
            elif isinstance(v, dict):
                vals.append((f.name, tuple(sorted(v.items()))))
            elif isinstance(v, object):
                vals.append((f.name, v))
            else:
                vals.append((f.name, v))
        return tuple(vals)

    def __eq__(self, other):
        return (type(other) is type(self)
                and self._content_key() == other._content_key())

    def __hash__(self):
        if self._hash is None:
            object.__setattr__(self, "_hash", hash(self._content_key()))
        return self._hash


def schedule(ops: Sequence, tips: int, export_clvs: Sequence[int]
             ) -> Optional[TreeVmemProgram]:
    """Sethi–Ullman slot allocation over an operation forest.

    ops: partition.Operation list (any topological order).  Returns None
    when the list is not a forest (a CLV written twice, or a child that is
    neither a tip nor produced here — e.g. partial traversals), in which
    case callers fall back to the XLA einsum path.
    """
    producer = {}
    for i, op in enumerate(ops):
        if op.parent_clv_index in producer:
            return None
        producer[op.parent_clv_index] = op
    if not producer:
        return None

    refcount: dict[int, int] = {}
    for op in ops:
        for c in (op.child1_clv_index, op.child2_clv_index):
            if c >= tips:
                if c not in producer:
                    return None
                refcount[c] = refcount.get(c, 0) + 1

    exports = [c for c in dict.fromkeys(export_clvs) if c in producer]
    roots = [p for p in producer if refcount.get(p, 0) == 0]

    # need(): minimum live slots to evaluate a subtree (heavier child first)
    need: dict[int, int] = {}
    for root in roots:
        stack = [(root, False)]
        while stack:
            node, seen = stack.pop()
            if node < tips or node in need:
                continue
            op = producer[node]
            kids = [c for c in (op.child1_clv_index, op.child2_clv_index)
                    if c >= tips]
            if not seen:
                stack.append((node, True))
                stack.extend((k, False) for k in kids)
            else:
                ns = sorted((need[k] for k in kids), reverse=True)
                if len(ns) == 0:
                    need[node] = 1
                elif len(ns) == 1:
                    need[node] = max(ns[0], 2)  # child held + parent slot
                else:
                    inner = max(ns[0], ns[1] + 1)
                    need[node] = max(inner, 3)  # both held + parent slot

    no_free = set(exports)
    slot_of: dict[int, int] = {}
    free: list[int] = []
    next_slot = 0
    rows: list[list[int]] = []
    export_pos: dict[int, tuple[int, int]] = {}  # clv -> (op_index, slot)
    live_ref = dict(refcount)

    def alloc() -> int:
        nonlocal next_slot
        if free:
            return free.pop()
        s = next_slot
        next_slot += 1
        return s

    for root in roots:
        stack = [(root, False)]
        while stack:
            node, seen = stack.pop()
            if node < tips:
                continue
            op = producer[node]
            kids = [c for c in (op.child1_clv_index, op.child2_clv_index)
                    if c >= tips]
            if not seen:
                stack.append((node, True))
                # push lighter child first so the heavier pops (runs) first
                for k in sorted(kids, key=lambda k: need[k]):
                    stack.append((k, False))
                continue
            # children evaluated; emit this op.  Parent gets a FRESH slot
            # (never a child's: the kernel writes the parent slab while
            # child slabs may still back in-flight reads).
            p_slot = alloc()
            slot_of[node] = p_slot

            def enc(c):
                if c < tips:
                    return [c, 0, 1]
                return [0, slot_of[c], 0]

            rows.append([p_slot]
                        + enc(op.child1_clv_index)
                        + enc(op.child2_clv_index)
                        + [op.child1_matrix_index, op.child2_matrix_index])
            if node in no_free:
                export_pos[node] = (len(rows) - 1, p_slot)
            for c in kids:
                live_ref[c] -= 1
                if live_ref[c] == 0 and c not in no_free:
                    free.append(slot_of[c])

    export_clv_map = {}
    export_scaler_map = {}
    export_list = []
    for row, clv in enumerate(exports):
        export_clv_map[clv] = row
        sidx = producer[clv].parent_scaler_index
        if sidx is not None and sidx >= 0:
            export_scaler_map[sidx] = row
        export_list.append(export_pos[clv])

    return TreeVmemProgram(
        ops=np.asarray(rows, dtype=np.int32).reshape(len(rows), OP_COLS),
        pool_size=next_slot,
        exports=tuple(export_list),
        export_clv_map=export_clv_map,
        export_scaler_map=export_scaler_map,
    )


# --------------------------------------------------------------------------
# split-K precision terms
# --------------------------------------------------------------------------
#
# Measured on TPU v5e: an [M, K] x [K, N] MXU pass costs ~ M*N cycles for
# any K <= 128 — the systolic array's contraction depth is padded to 128
# regardless, so K is FREE capacity.  The likelihood recursion needs
# f32-quality products from bf16 MXU passes; the stock route (precision=
# HIGHEST) runs SIX passes of the bf16 decomposition a·b = Σ a_i·b_j
# (i+j <= 2).  Split-K instead stacks all terms along the free contraction
# axis: C' = [c_{j_0}; ...; c_{j_{T-1}}] and P' = [P_{i_0} ... P_{i_T-1}}]
# give the identical f32-accumulated sum in ONE pass with K = T*span <=
# 128 — a 6x cut in MXU time at bit-identical term math.
#
#   parts=1 -> 1 term  (plain bf16, "default" quality)
#   parts=2 -> 3 terms (a0b0+a0b1+a1b0, ~f32 quality, "high")
#   parts=3 -> 6 terms (.. +a0b2+a1b1+a2b0, full f32 quality, "highest")
#
# The CLV slot pool holds bf16 split parts [slots, parts, span, TB]; the
# parent is computed in f32 (MXU accumulates f32) and re-split on store.

# terms sorted by P-part index so the stacked CLV operand is a sequence
# of PREFIXES of the contiguous [parts*span] pool slab: for parts=3 the
# c-pattern is [c0 c1 c2 | c0 c1 | c0] — three static prefix slices of
# one slot read, no block gathers
SPLIT_TERMS = {
    1: ((0, 0),),
    2: ((0, 0), (0, 1), (1, 0)),
    3: ((0, 0), (0, 1), (0, 2), (1, 0), (1, 1), (2, 0)),
}

# term order for the STATIC kernel: j=0 terms first, so the P operand's
# leading `parts` column blocks are [P_0 P_1 ... ] — exactly the K-slice a
# TIP child needs (tip CLVs are exact 0/1 in bf16, so c_0 = tip, c_{>0} =
# 0, and stacking `parts` copies of the tip against that prefix f32-sums
# the full-precision P @ tip in ONE short-K pass)
STATIC_TERMS = {
    1: ((0, 0),),
    2: ((0, 0), (1, 0), (0, 1)),
    3: ((0, 0), (1, 0), (2, 0), (0, 1), (1, 1), (0, 2)),
}

PRECISION_PARTS = {"highest": 3, "high": 2, "default": 1}


def _parts_for(cfg: PartitionConfig) -> int:
    if cfg.dtype == jnp.bfloat16:
        return 1           # storage is bf16 anyway; splits add nothing
    return PRECISION_PARTS[cfg.pallas_precision]


def vmem_bytes(prog: TreeVmemProgram, cfg: PartitionConfig, tb: int,
               num_pmatrices: int, mode: str) -> int:
    """Estimated VMEM footprint of the kernel at site-block size tb."""
    itemsize = 2 if cfg.dtype == jnp.bfloat16 else 4
    span = cfg.rate_cats * cfg.states
    spool = prog.pool_size * tb * 4
    tipblk = 2 * cfg.tips * tb * 4                      # double-buffered
    if mode == "static":
        return vmem_bytes_static(prog, cfg, tb, num_pmatrices)
    if mode == "static-seg":
        # plain static footprint + double-buffered carry in-blocks
        # (actual max live slots at any segment boundary, not a guess)
        n_terms = len(STATIC_TERMS[_parts_for(cfg)])
        n_carry = segment_static(prog).max_carry
        carry = 2 * n_carry * n_terms * span * tb * 2
        return vmem_bytes_static(prog, cfg, tb, num_pmatrices) + carry
    if mode == "splitk":
        parts = _parts_for(cfg)
        n_terms = len(SPLIT_TERMS[parts])
        pool = prog.pool_size * parts * span * tb * 2
        pmat = num_pmatrices * span * n_terms * span * 2
        expbuf = max(len(prog.exports), 1) * span * tb * 4
        work = 3 * n_terms * span * tb * 2
        return pool + spool + tipblk + pmat + expbuf + work + (1 << 20)
    pool = prog.pool_size * span * tb * itemsize
    if mode == "mxu":
        pmat = num_pmatrices * span * span * itemsize
    else:
        pmat = num_pmatrices * cfg.rate_cats * cfg.states ** 2 * itemsize
    return pool + spool + tipblk + pmat + (1 << 20)


def pick_site_block(prog: TreeVmemProgram, cfg: PartitionConfig,
                    num_pmatrices: int, mode: str,
                    target: int = 65536) -> int:
    """Largest multiple-of-128 block <= target dividing sites_padded that
    fits the VMEM budget; 0 if none does."""
    best = 0
    for tb in range(128, min(target, cfg.sites_padded) + 1, 128):
        if cfg.sites_padded % tb:
            continue
        if vmem_bytes(prog, cfg, tb, num_pmatrices, mode) <= VMEM_BUDGET:
            best = tb
    return best


def choose(prog: Optional[TreeVmemProgram], cfg: PartitionConfig,
           num_pmatrices: int) -> Optional[tuple]:
    """Pick (site_block, mode) for the kernel, or None if unsupported.

    Mode preference: "splitk" (one MXU pass at the configured precision)
    whenever the stacked contraction fits one 128-deep tile; else the
    multi-pass rate-block-diagonal "mxu" mode; else the "vpu"
    broadcast-fma form."""
    if prog is None or prog.n_ops == 0:
        return None
    if cfg.dtype not in (jnp.float32, jnp.bfloat16):
        return None
    span = cfg.rate_cats * cfg.states
    itemsize = 2 if cfg.dtype == jnp.bfloat16 else 4
    parts = _parts_for(cfg)
    # topology-specialized kernel first: fastest at every measured state
    # count (v5e round 5: DNA ~8.1e9, S=20 protein ~0.9e9 upd/s at full
    # f32 quality — contraction depths
    # beyond 128 chunk fine on the MXU), and the only kernel family with
    # per-rate-scaler support.  Bounded op count keeps the unrolled Mosaic
    # program to a sane compile time.  (A c-major "static2" variant was
    # retired in round 4: exact but pathologically slow on-chip, and
    # tools/static2probe.py showed its prefix-matmul construct is fine in
    # isolation — the mode carried no perf role.)
    # site block capped AND scaled down with span: Mosaic compile
    # memory/time grows with n_ops x tb x span for the unrolled program
    # (16k blocks OOM the compiler at ~250 DNA ops; 126 S=20 ops at
    # tb=4096 cost 160 s on v5e, 16.6 s at tb=512 for -4% throughput)
    tb_target = min(STATIC_MAX_TB,
                    max(128, (STATIC_MAX_TB * 16 // span) // 128 * 128))
    if prog.n_ops <= STATIC_MAX_OPS:
        tb = pick_site_block(prog, cfg, num_pmatrices, "static",
                             target=tb_target)
        if tb >= 128:
            return tb, "static"
    if prog.n_ops <= STATIC_SEG_MAX_OPS:
        # segmented unrolled kernel: bounded compile per segment, live
        # slots carried across boundaries (see segment_static).  v5e,
        # 1022-op DNA tree: 192-op segments reach 6.3e9 upd/s (vs
        # 3.9e9 splitk) at moderate compile; 511-op halves reach 7.1e9
        # but pay ~112 s cold compile — boundaries cost ~3%/each,
        # compile grows superlinearly per segment
        tb = pick_site_block(prog, cfg, num_pmatrices, "static-seg",
                             target=tb_target)
        if tb >= 128:
            return tb, "static-seg"
    if cfg.per_rate_scalers:
        return None
    if len(SPLIT_TERMS[parts]) * span <= 128:
        tb = pick_site_block(prog, cfg, num_pmatrices, "splitk")
        if tb >= 128:
            return tb, "splitk"
    if num_pmatrices * span * span * itemsize <= 24 * 1024 * 1024:
        tb = pick_site_block(prog, cfg, num_pmatrices, "mxu")
        if tb >= 128:
            return tb, "mxu"
    tb = pick_site_block(prog, cfg, num_pmatrices, "vpu")
    if tb >= 128:
        return tb, "vpu"
    return None


def supported(prog: Optional[TreeVmemProgram], cfg: PartitionConfig,
              num_pmatrices: int) -> bool:
    return choose(prog, cfg, num_pmatrices) is not None


def _tree_kernel(ops_ref,                     # [OPS, 9] (scalar prefetch)
                 pmat_ref,                    # MXU: [P, R*S, R*S] blockdiag
                 tip_ref,                     # [1, tips, TB] VMEM (per block)
                 clv_out, scal_out,           # HBM outputs (manual DMA)
                 pool, spool, exp_sems,
                 *, n_ops: int, states: int, rates: int,
                 thresh: float, factor: float,
                 exports: tuple, mxu: bool, precision):
    t = pl.program_id(0)
    w = pl.program_id(1)
    dtype = pool.dtype
    tb = tip_ref.shape[-1]
    span = rates * states

    p1 = pmat_ref[ops_ref[w, 7]]              # [RS, RS] | [R, S, S]
    p2 = pmat_ref[ops_ref[w, 8]]
    iota = jax.lax.broadcasted_iota(jnp.int32, (states, tb), 0)

    def child(tip_col, slot_col, flag_col):
        is_tip = ops_ref[w, flag_col] != 0
        tiprow = tip_ref[0, ops_ref[w, tip_col]]          # [TB] int32
        bits = ((tiprow[None, :] >> iota) & 1).astype(dtype)
        cin = pool[ops_ref[w, slot_col]]                  # [RS|R,S, TB]
        sin = spool[ops_ref[w, slot_col]]                 # [1, TB]
        if mxu:
            tipc = jnp.broadcast_to(bits[None],
                                    (rates, states, tb)).reshape(span, tb)
            c = jnp.where(is_tip, tipc, cin)              # [RS, TB]
        else:
            c = jnp.where(is_tip, bits[None], cin)        # [R, S, TB]
        s = jnp.where(is_tip, jnp.zeros_like(sin), sin)
        return c, s

    c1, s1 = child(1, 2, 3)
    c2, s2 = child(4, 5, 6)

    if mxu:
        # rate-block-diagonal P keeps the propagation a single 2-D matmul
        # per child -> MXU (systolic array), which otherwise idles: the
        # sweep has no other matmul-shaped work
        dn = (((1,), (0,)), ((), ()))
        left = jax.lax.dot_general(p1, c1, dn, precision=precision,
                                   preferred_element_type=dtype)
        right = jax.lax.dot_general(p2, c2, dn, precision=precision,
                                    preferred_element_type=dtype)
        parent = left * right                             # [RS, TB]
        mask = jnp.max(parent, axis=0, keepdims=True) < thresh  # [1, TB]
        parent = jnp.where(mask, parent * factor, parent)
        snew = s1 + s2 + mask.astype(jnp.int32)
    else:
        left = p1[:, :, 0:1] * c1[:, 0:1, :]
        right = p2[:, :, 0:1] * c2[:, 0:1, :]
        for j in range(1, states):
            left += p1[:, :, j:j + 1] * c1[:, j:j + 1, :]
            right += p2[:, :, j:j + 1] * c2[:, j:j + 1, :]
        parent = left * right                             # [R, S, TB]

        # all(parent < thresh) == max(parent) < thresh (f32 max-reduce:
        # Mosaic rejects multi-axis bool reductions under some configs)
        mask = jnp.max(parent, axis=(0, 1), keepdims=True) < thresh
        parent = jnp.where(mask, parent * factor, parent)
        snew = s1 + s2 + mask[0].astype(jnp.int32)

    p_slot = ops_ref[w, 0]
    pool[p_slot] = parent
    spool[p_slot] = snew

    def exp_copies(e, slot):
        # static python ints promote to i64 under jax_enable_x64, which the
        # Mosaic memref_slice verifier rejects — pin every index to i32
        e32, s32 = jnp.int32(e), jnp.int32(slot)
        zero, one = jnp.int32(0), jnp.int32(1)
        return (pltpu.make_async_copy(pool.at[s32], clv_out.at[e32, t],
                                      exp_sems.at[e32, zero]),
                pltpu.make_async_copy(spool.at[s32], scal_out.at[e32, t],
                                      exp_sems.at[e32, one]))

    for e, (op_idx, slot) in enumerate(exports):
        @pl.when(w == op_idx)
        def _start(e=e, op_idx=op_idx, slot=slot):
            for c in exp_copies(e, slot):
                c.start()

    @pl.when(w == n_ops - 1)
    def _drain():
        for e, (op_idx, slot) in enumerate(exports):
            for c in exp_copies(e, slot):
                c.wait()


def _block_diag_pmatrix(pmatrix, dtype):
    """[P, R, S, S] -> [P, R*S, R*S] with per-rate blocks on the diagonal."""
    P, R, S, _ = pmatrix.shape
    eye = jnp.eye(R, dtype=dtype)                         # [R, R]
    # out[p, r*S+i, q*S+j] = pmatrix[p, r, i, j] * (r == q)
    out = jnp.einsum("prij,rq->priqj", pmatrix, eye, precision=HIGHEST)
    return out.reshape(P, R * S, R * S)


def _round_f32_to_bf16_bits(x):
    """Round-to-nearest-even f32 -> bf16 IN THE INTEGER DOMAIN.

    XLA's TPU pipeline runs with excess precision allowed, and its
    simplifier may elide a lossy f32->bf16->f32 convert pair as an
    identity — which silently zeroes the residual split parts (observed
    on-chip: only P_0 survived, 2^-8 CLV error).  Bit arithmetic cannot
    be elided.  Returns (bf16 value, exact f32 value of that bf16)."""
    u = jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32)
    rounded = (u + jnp.uint32(0x7FFF)
               + ((u >> 16) & jnp.uint32(1))) & jnp.uint32(0xFFFF0000)
    exact = jax.lax.bitcast_convert_type(rounded, jnp.float32)
    return exact.astype(jnp.bfloat16), exact


def _bf16_splits(x, parts: int):
    """Split an f32 array into `parts` bf16 arrays summing to it."""
    out = []
    rem = x.astype(jnp.float32)
    for j in range(parts):
        pj, pj_exact = _round_f32_to_bf16_bits(rem)
        out.append(pj)
        if j + 1 < parts:
            rem = rem - pj_exact
    return out


def _split_pmatrix_terms(pmatrix, parts: int):
    """[P, R, S, S] f32 -> [P, span, n_terms*span] bf16 split-K operand.

    Column block t holds P-part i_t of the block-diagonal matrix, paired
    with CLV part j_t in the kernel's stacked child operand."""
    bd = _block_diag_pmatrix(pmatrix.astype(jnp.float32), jnp.float32)
    p_parts = _bf16_splits(bd, parts)
    terms = SPLIT_TERMS[parts]
    return jnp.concatenate([p_parts[i] for i, _ in terms], axis=2)


def _tree_kernel_splitk(ops_ref,              # [OPS, 9] (scalar prefetch)
                        pmat_ref,             # [P, span, T*span] bf16 VMEM
                        tip_ref,              # [1, tips, TB] VMEM
                        clv_out, scal_out,    # HBM outputs (manual DMA)
                        pool, spool, exp_buf, exp_sems,
                        *, n_ops: int, states: int, rates: int,
                        parts: int, thresh: float, factor: float,
                        exports: tuple):
    """One MXU pass per child at the configured split precision.

    pool: [slots, parts, span, TB] bf16 — CLVs as bf16 split parts.
    exp_buf: [n_exp, span, TB] f32 — exported rows rebuilt in f32."""
    t = pl.program_id(0)
    w = pl.program_id(1)
    tb = tip_ref.shape[-1]
    span = rates * states
    terms = SPLIT_TERMS[parts]
    n_terms = len(terms)
    iota = jax.lax.broadcasted_iota(jnp.int32, (states, tb), 0)

    def child(tip_col, slot_col, flag_col):
        is_tip = ops_ref[w, flag_col] != 0
        tiprow = tip_ref[0, ops_ref[w, tip_col]]          # [TB] int32
        bits = ((tiprow[None, :] >> iota) & 1).astype(jnp.bfloat16)
        tipc = jnp.broadcast_to(bits[None],
                                (rates, states, tb)).reshape(span, tb)
        slot = ops_ref[w, slot_col]
        cparts = []
        for j in range(parts):
            pj = pool[slot, j]                            # [span, TB] bf16
            tj = tipc if j == 0 else jnp.zeros_like(tipc)
            cparts.append(jnp.where(is_tip, tj, pj))
        sin = spool[slot]                                 # [1, TB]
        s = jnp.where(is_tip, jnp.zeros_like(sin), sin)
        stacked = jnp.concatenate([cparts[j] for _, j in terms], axis=0)
        return stacked, s                                 # [T*span, TB]

    c1, s1 = child(1, 2, 3)
    c2, s2 = child(4, 5, 6)
    p1 = pmat_ref[ops_ref[w, 7]]                          # [span, T*span]
    p2 = pmat_ref[ops_ref[w, 8]]

    dn = (((1,), (0,)), ((), ()))
    left = jax.lax.dot_general(p1, c1, dn,
                               preferred_element_type=jnp.float32)
    right = jax.lax.dot_general(p2, c2, dn,
                                preferred_element_type=jnp.float32)
    parent = left * right                                 # [span, TB] f32
    mask = jnp.max(parent, axis=0, keepdims=True) < thresh
    parent = jnp.where(mask, parent * factor, parent)
    snew = s1 + s2 + mask.astype(jnp.int32)

    p_slot = ops_ref[w, 0]
    rem = parent
    for j in range(parts):
        pj = rem.astype(jnp.bfloat16)
        pool[p_slot, j] = pj
        if j + 1 < parts:
            rem = rem - pj.astype(jnp.float32)
    spool[p_slot] = snew

    def exp_copies(e, slot):
        e32, s32 = jnp.int32(e), jnp.int32(slot)
        zero, one = jnp.int32(0), jnp.int32(1)
        return (pltpu.make_async_copy(exp_buf.at[e32], clv_out.at[e32, t],
                                      exp_sems.at[e32, zero]),
                pltpu.make_async_copy(spool.at[s32], scal_out.at[e32, t],
                                      exp_sems.at[e32, one]))

    for e, (op_idx, slot) in enumerate(exports):
        @pl.when(w == op_idx)
        def _start(e=e, slot=slot):
            exp_buf[jnp.int32(e)] = parent
            for c in exp_copies(e, slot):
                c.start()

    @pl.when(w == n_ops - 1)
    def _drain():
        for e, (op_idx, slot) in enumerate(exports):
            for c in exp_copies(e, slot):
                c.wait()


@functools.partial(jax.jit,
                   static_argnames=("prog", "cfg", "tb", "mxu", "mode",
                                    "interpret"))
def sweep(tip_blocked, pmatrix, prog: TreeVmemProgram, cfg: PartitionConfig,
          tb: int, mxu: bool = False, mode=None, interpret: bool = False):
    """Run the VMEM-resident sweep.

    tip_blocked: [NT, tips, TB] int32 packed state bitmasks (block-major so
                 each per-block fetch is one full-tile slab)
    pmatrix:     [P, R, S, S]
    mode:        "splitk" | "mxu" | "vpu"; None derives from the legacy
                 mxu flag (kept for the parity-test matrix)
    Returns (clv_rows [E, NT, R, S, TB], scaler_rows [E, NT, 1, TB] int32)
    for the E exported rows (prog.export_clv_map order).
    """
    nt, tips, tb_in = tip_blocked.shape
    assert tb_in == tb and nt * tb == cfg.sites_padded
    R, S = cfg.rate_cats, cfg.states
    span = R * S
    n_exp = len(prog.exports)
    if mode is None:
        mode = "mxu" if mxu else "vpu"

    P = pmatrix.shape[0]
    common = dict(n_ops=prog.n_ops, states=S, rates=R,
                  thresh=cfg.scale_threshold, factor=cfg.scale_factor,
                  exports=prog.exports)
    if mode == "splitk":
        parts = _parts_for(cfg)
        n_terms = len(SPLIT_TERMS[parts])
        kernel = functools.partial(_tree_kernel_splitk, parts=parts,
                                   **common)
        pmat_in = _split_pmatrix_terms(pmatrix, parts)
        pmat_spec = pl.BlockSpec((P, span, n_terms * span),
                                 lambda t, w, ops: (jnp.int32(0),) * 3,
                                 memory_space=pltpu.VMEM)
        scratch = [
            pltpu.VMEM((prog.pool_size, parts, span, tb), jnp.bfloat16),
            pltpu.VMEM((prog.pool_size, 1, tb), jnp.int32),
            pltpu.VMEM((max(n_exp, 1), span, tb), jnp.float32),
            pltpu.SemaphoreType.DMA((max(n_exp, 1), 2)),
        ]
        clv_shape = (n_exp, nt, span, tb)
        out_dtype = jnp.float32
    else:
        kernel = functools.partial(
            _tree_kernel, mxu=(mode == "mxu"),
            precision=PRECISIONS[cfg.pallas_precision], **common)
        if mode == "mxu":
            pmat_in = _block_diag_pmatrix(pmatrix, cfg.dtype)
            pmat_spec = pl.BlockSpec((P, span, span),
                                     lambda t, w, ops: (jnp.int32(0),) * 3,
                                     memory_space=pltpu.VMEM)
            pool_shape = (prog.pool_size, span, tb)
            clv_shape = (n_exp, nt, span, tb)
        else:
            pmat_in = pmatrix
            pmat_spec = pl.BlockSpec((P, R, S, S),
                                     lambda t, w, ops: (jnp.int32(0),) * 4,
                                     memory_space=pltpu.VMEM)
            pool_shape = (prog.pool_size, R, S, tb)
            clv_shape = (n_exp, nt, R, S, tb)
        scratch = [
            pltpu.VMEM(pool_shape, cfg.dtype),
            pltpu.VMEM((prog.pool_size, 1, tb), jnp.int32),
            pltpu.SemaphoreType.DMA((max(n_exp, 1), 2)),
        ]
        out_dtype = cfg.dtype

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nt, prog.n_ops),
        in_specs=[
            # index maps return jnp.int32: python-int constants trace to
            # i64 under jax_enable_x64 and fail Mosaic legalization
            pmat_spec,
            pl.BlockSpec((1, tips, tb),
                         lambda t, w, ops: (t, jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=scratch,
    )

    clv_rows, scal_rows = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct(clv_shape, out_dtype),
            jax.ShapeDtypeStruct((n_exp, nt, 1, tb), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=prog.n_ops * nt * R * S * tb * (4 * S + 1),
            bytes_accessed=tips * nt * tb * 4
            + n_exp * nt * R * S * tb * np.dtype(out_dtype).itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(prog.ops, pmat_in, tip_blocked)
    if clv_rows.ndim == 4:
        clv_rows = clv_rows.reshape(n_exp, nt, R, S, tb)
    return clv_rows, scal_rows


# --------------------------------------------------------------------------
# Topology-specialized (static) kernel — the fastest path
# --------------------------------------------------------------------------
#
# The runtime-ops kernel above reads each operation row from SMEM and
# resolves tip-vs-inner children with whole-slab selects; profiling on TPU
# v5e shows those per-op VPU costs (selects + the stack-concatenate), not
# the MXU passes, bound its throughput (~2x gap between parts=3 and
# parts=1 at identical op counts).  Engine-level jit already specializes
# per topology (TreeProgram is a static argument), so nothing is lost by
# specializing the KERNEL too: unroll the op list in the kernel body with
# every slot/tip/pmatrix index a Python constant.  Gains:
#   * no scalar-prefetch loads, no is_tip selects — tips expand bits only
#     where a child really is a tip;
#   * the CLV slot pool stores slabs ALREADY STACKED in term order
#     [n_terms*span, TB], so the matmul operand is one direct static read
#     (write amplification parts->n_terms, but it replaces a read+concat
#     round trip per consumer);
#   * tip children run a SHORT matmul: K = parts*span against the P
#     operand's leading blocks (STATIC_TERMS comment above) — exact f32
#     since tip entries are 0/1;
#   * per-rate scalers come for free (the rescue test reshapes to
#     [R, S, TB] and masks per rate — core_likelihood.c:445-491 protocol).
#
# The runtime-ops kernel stays: it is the one that caches across
# topologies for search workloads.


def _split_pmatrix_terms_static(pmatrix, parts: int):
    """[P, R, S, S] f32 -> (pterms [P, span, n_terms*span] bf16 in
    STATIC_TERMS order, ptq [P, span, parts*S] bf16 Q-compressed tips).

    ptq block j is the rate-diagonal [span, S] slice of split part j:
    P is rate-block-diagonal and a tip CLV repeats its state bits across
    rate blocks, so P @ tip == Q @ bits — a K = parts*S matmul against
    the raw bit expansion, with no span-wide tip materialization
    (PATTERN_TIP's precomputed-lookup role, pll.h:124, done MXU-side).
    The contraction is zero-padded to a multiple of the 16-row bf16 tile
    (Mosaic miscompiles sub-tile contraction depths); the kernel's padded
    operand rows are zero via >=bit-width shifts (_tip_shift_rows)."""
    P, R, S, _ = pmatrix.shape
    span = R * S
    bd = _block_diag_pmatrix(pmatrix.astype(jnp.float32), jnp.float32)
    p_parts = _bf16_splits(bd, parts)
    pterms = jnp.concatenate(
        [p_parts[i] for i, _ in STATIC_TERMS[parts]], axis=2)
    eye = jnp.eye(R, dtype=jnp.bfloat16)
    qs = []
    for j in range(parts):
        pj = p_parts[j].reshape(P, R, S, R, S)
        q = jnp.einsum("prsqt,rq->prst", pj, eye,
                       precision=HIGHEST)            # exact: picks r == q
        qs.append(q.reshape(P, span, S))
    kq = -(-(parts * S) // 16) * 16
    pad = jnp.zeros((P, span, kq - parts * S), jnp.bfloat16)
    return pterms, jnp.concatenate(qs + [pad], axis=2)


def _tip_shift_rows(states: int, parts: int, kq: int, tb: int):
    """Shift-amount plane building the padded tip operand in one VPU op:
    row j*S+s decodes state bit s; pad rows shift by 31 (tip codes are
    < 2^states <= 2^20, so the result is exactly 0).  Built from an
    in-kernel iota — Pallas kernels cannot capture array constants."""
    r = jax.lax.broadcasted_iota(jnp.int32, (kq, tb), 0)
    return jnp.where(r < parts * states, r % states, 31)


def _tree_kernel_static(pmat_ref,              # [P, span, T*span] bf16 VMEM
                        ptq_ref,               # [P, span, parts*S] bf16
                        tip_ref,               # [1, tips, TB] VMEM
                        clv_out, scal_out,     # HBM outputs (manual DMA)
                        pool, spool, exp_buf, exp_sems,
                        *, rows: tuple, states: int, rates: int,
                        parts: int, per_rate: bool,
                        thresh: float, factor: float, exports: tuple):
    """One unrolled pass over all ops for one site block.

    pool: [slots, n_terms*span, TB] bf16 — stacked term operands.
    spool: [slots, SR, TB] int32, SR = rates if per_rate else 1.
    exp_buf: [n_exp, span, TB] f32."""
    t = pl.program_id(0)
    tb = tip_ref.shape[-1]
    span = rates * states
    terms = STATIC_TERMS[parts]
    export_at = {op_idx: (e, slot)
                 for e, (op_idx, slot) in enumerate(exports)}
    started = []

    kq = ptq_ref.shape[-1]
    tip_shifts = _tip_shift_rows(states, parts, kq, tb)

    def child(tip_idx, slot, is_tip, pm):
        if is_tip:
            # Q-compressed tip: K = parts*S (tile-padded) against the raw
            # bit rows (_split_pmatrix_terms_static) — no span broadcast
            tiprow = tip_ref[0, tip_idx]                  # [TB] int32
            operand = ((tiprow[None, :] >> tip_shifts) & 1
                       ).astype(jnp.bfloat16)             # [kq, TB]
            return ptq_ref[pm], operand, None
        return pmat_ref[pm], pool[slot], spool[slot]

    dn = (((1,), (0,)), ((), ()))
    for w, row in enumerate(rows):
        (p_slot, c1_tip, c1_slot, c1_is_tip,
         c2_tip, c2_slot, c2_is_tip, pm1, pm2) = row
        p1, c1, s1 = child(c1_tip, c1_slot, c1_is_tip, pm1)
        p2, c2, s2 = child(c2_tip, c2_slot, c2_is_tip, pm2)
        left = jax.lax.dot_general(p1, c1, dn,
                                   preferred_element_type=jnp.float32)
        right = jax.lax.dot_general(p2, c2, dn,
                                    preferred_element_type=jnp.float32)
        parent = left * right                             # [span, TB] f32
        if per_rate:
            pr = parent.reshape(rates, states, tb)
            mask = jnp.max(pr, axis=1, keepdims=True) < thresh  # [R, 1, TB]
            parent = jnp.where(mask, pr * factor, pr).reshape(span, tb)
            snew = mask[:, 0].astype(jnp.int32)           # [R, TB]
        else:
            mask = jnp.max(parent, axis=0, keepdims=True) < thresh
            parent = jnp.where(mask, parent * factor, parent)
            snew = mask.astype(jnp.int32)                 # [1, TB]
        if s1 is not None:
            snew = snew + s1
        if s2 is not None:
            snew = snew + s2

        rem = parent
        split = []
        for j in range(parts):
            pj = rem.astype(jnp.bfloat16)
            split.append(pj)
            if j + 1 < parts:
                rem = rem - pj.astype(jnp.float32)
        pool[p_slot] = jnp.concatenate([split[j] for _, j in terms], axis=0)
        spool[p_slot] = snew

        if w in export_at:
            e, slot = export_at[w]
            e32 = jnp.int32(e)
            exp_buf[e32] = parent
            copies = (
                pltpu.make_async_copy(exp_buf.at[e32], clv_out.at[e32, t],
                                      exp_sems.at[e32, jnp.int32(0)]),
                pltpu.make_async_copy(spool.at[jnp.int32(slot)],
                                      scal_out.at[e32, t],
                                      exp_sems.at[e32, jnp.int32(1)]),
            )
            for c in copies:
                c.start()
            started.append(copies)

    for copies in started:
        for c in copies:
            c.wait()


@functools.partial(jax.jit,
                   static_argnames=("prog", "cfg", "tb", "interpret"))
def sweep_static(tip_blocked, pmatrix, prog: TreeVmemProgram,
                 cfg: PartitionConfig, tb: int, interpret: bool = False):
    """Topology-specialized VMEM sweep (see block comment above).

    Same contract as sweep(): returns (clv_rows [E, NT, R, S, TB] f32,
    scaler_rows [E, NT, SR, TB] int32) with SR = R under per-rate scalers
    else 1."""
    nt, tips, tb_in = tip_blocked.shape
    assert tb_in == tb and nt * tb == cfg.sites_padded
    R, S = cfg.rate_cats, cfg.states
    span = R * S
    n_exp = len(prog.exports)
    parts = _parts_for(cfg)
    n_terms = len(STATIC_TERMS[parts])
    sr = R if cfg.per_rate_scalers else 1
    P = pmatrix.shape[0]

    kernel = functools.partial(
        _tree_kernel_static,
        rows=tuple(tuple(int(v) for v in r) for r in prog.ops),
        states=S, rates=R, parts=parts,
        per_rate=cfg.per_rate_scalers,
        thresh=cfg.scale_threshold, factor=cfg.scale_factor,
        exports=prog.exports)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((P, span, n_terms * span),
                         lambda t: (jnp.int32(0),) * 3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((P, span, -(-(parts * S) // 16) * 16),
                         lambda t: (jnp.int32(0),) * 3,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tips, tb),
                         lambda t: (t, jnp.int32(0), jnp.int32(0)),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ),
        scratch_shapes=[
            pltpu.VMEM((prog.pool_size, n_terms * span, tb), jnp.bfloat16),
            pltpu.VMEM((prog.pool_size, sr, tb), jnp.int32),
            pltpu.VMEM((max(n_exp, 1), span, tb), jnp.float32),
            pltpu.SemaphoreType.DMA((max(n_exp, 1), 2)),
        ],
    )

    clv_rows, scal_rows = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_exp, nt, span, tb), jnp.float32),
            jax.ShapeDtypeStruct((n_exp, nt, sr, tb), jnp.int32),
        ),
        compiler_params=pltpu.CompilerParams(
            # site blocks are fully independent
            dimension_semantics=("parallel",),
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=prog.n_ops * nt * R * S * tb * (4 * S + 1),
            bytes_accessed=tips * nt * tb * 4
            + n_exp * nt * R * S * tb * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(*_split_pmatrix_terms_static(pmatrix, parts), tip_blocked)
    return clv_rows.reshape(n_exp, nt, R, S, tb), scal_rows


def vmem_bytes_static(prog: TreeVmemProgram, cfg: PartitionConfig, tb: int,
                      num_pmatrices: int) -> int:
    span = cfg.rate_cats * cfg.states
    parts = _parts_for(cfg)
    n_terms = len(STATIC_TERMS[parts])
    sr = cfg.rate_cats if cfg.per_rate_scalers else 1
    pool = prog.pool_size * n_terms * span * tb * 2
    spool = prog.pool_size * sr * tb * 4
    tipblk = 2 * cfg.tips * tb * 4
    kq = -(-(parts * cfg.states) // 16) * 16       # ptq tile padding
    pmat = num_pmatrices * span * (n_terms * span + kq) * 2
    expbuf = max(len(prog.exports), 1) * span * tb * 4
    work = 3 * n_terms * span * tb * 2
    return pool + spool + tipblk + pmat + expbuf + work + (1 << 20)


def unblock_clv_row(row_blocked):
    """[NT, R, S, TB] -> [R, S, NT*TB]."""
    nt, R, S, tb = row_blocked.shape
    return jnp.transpose(row_blocked, (1, 2, 0, 3)).reshape(R, S, nt * tb)


def unblock_scaler_row(row_blocked):
    """[NT, 1, TB] -> [NT*TB]; per-rate [NT, R, TB] -> [R, NT*TB]."""
    nt, sr, tb = row_blocked.shape
    if sr == 1:
        return row_blocked.reshape(nt * tb)
    return jnp.transpose(row_blocked, (1, 0, 2)).reshape(sr, nt * tb)


# --------------------------------------------------------------------------
# Segmented static kernel — the static path beyond STATIC_MAX_OPS
# --------------------------------------------------------------------------
#
# Mosaic compile cost for the unrolled kernel grows superlinearly with the
# op count (and with span): 1022 DNA ops or 126 S=20 ops in one program
# blow the compile budget (163 s protein cold compile, round-4 artifact),
# and big trees used to fall off the static path entirely (dna_1024 at
# half throughput on splitk).  The fix: cut the op list into SEGMENTS of
# bounded unrolled work, each its own pallas_call; slots live across a
# boundary are DMA'd out as bf16 stacked-term slabs and re-enter the next
# segment as a VMEM-blocked input.  The Sethi–Ullman pool keeps the live
# set O(depth), so a boundary carries ~a dozen slabs — a few MB of HBM
# traffic per boundary vs the ~100x streaming traffic the VMEM design
# exists to avoid.  Exports keep their exact-f32 capture semantics
# (exp_buf at produce time) per segment.

SEG_OPS = 192                   # unrolled ops per segment (measured knee:
                                # throughput loses ~3%/boundary; per-segment
                                # Mosaic compile grows superlinearly in ops)
STATIC_SEG_MAX_OPS = 4096       # total op bound for the segmented path


@dataclasses.dataclass(frozen=True, eq=False)
class StaticSegment:
    rows: tuple                  # ((p_slot, c1..., pm1, pm2), ...) with
                                 # slot < 0 meaning carry row -(slot+1)
    carry_in: tuple              # slot ids entering this segment
    carry_out: tuple             # slot ids leaving this segment
    exports: tuple               # ((local_op_idx, slot, global_row), ...)


@dataclasses.dataclass(frozen=True, eq=False)
class SegmentedProgram:
    segments: tuple              # (StaticSegment, ...)
    pool_size: int
    n_exp: int
    export_clv_map: dict
    export_scaler_map: dict
    _hash: int = dataclasses.field(default=None, compare=False, repr=False)

    @property
    def n_ops(self) -> int:
        return sum(len(s.rows) for s in self.segments)

    @property
    def max_carry(self) -> int:
        return max([1] + [max(len(s.carry_in), len(s.carry_out))
                          for s in self.segments])

    def _content_key(self):
        return (self.segments, self.pool_size, self.n_exp,
                tuple(sorted(self.export_clv_map.items())),
                tuple(sorted(self.export_scaler_map.items())))

    def __eq__(self, other):
        return (type(other) is type(self)
                and self._content_key() == other._content_key())

    def __hash__(self):
        if self._hash is None:
            object.__setattr__(self, "_hash",
                               hash(self._content_key()))
        return self._hash


def segment_static(prog: TreeVmemProgram,
                   seg_ops: Optional[int] = None) -> SegmentedProgram:
    """Cut a TreeVmemProgram's op list into bounded-op segments with
    carry lists (see block comment)."""
    if seg_ops is None:
        seg_ops = SEG_OPS
    ops = prog.ops
    n = ops.shape[0]
    n_segs = -(-n // seg_ops)
    bounds = [(s * seg_ops, min((s + 1) * seg_ops, n))
              for s in range(n_segs)]
    seg_of_op = np.zeros(n, np.int32)
    for s, (a, b) in enumerate(bounds):
        seg_of_op[a:b] = s

    # governing write segment per read occurrence
    write_seg: dict[int, int] = {}
    carry_in: list[set] = [set() for _ in range(n_segs)]
    carry_out: list[set] = [set() for _ in range(n_segs)]
    rewritten = []
    export_by_op = {op_idx: (e, slot) for e, (op_idx, slot)
                    in enumerate(prog.exports)}
    seg_exports: list[list] = [[] for _ in range(n_segs)]
    for i in range(n):
        s = int(seg_of_op[i])
        row = [int(v) for v in ops[i]]
        for slot_col, flag_col in ((2, 3), (5, 6)):
            if row[flag_col]:
                continue
            v = row[slot_col]
            ws = write_seg[v]
            if ws != s:
                carry_in[s].add(v)
                carry_out[ws].add(v)
        write_seg[row[0]] = s
        rewritten.append(row)
        if i in export_by_op:
            e, slot = export_by_op[i]
            seg_exports[s].append((i - bounds[s][0], slot, e))

    segments = []
    for s, (a, b) in enumerate(bounds):
        cin = tuple(sorted(carry_in[s]))
        cin_row = {v: k for k, v in enumerate(cin)}
        rows = []
        wrote: set = set()
        for i in range(a, b):
            row = list(rewritten[i])
            for slot_col, flag_col in ((2, 3), (5, 6)):
                if row[flag_col]:
                    continue
                v = row[slot_col]
                if v in cin_row and v not in wrote:
                    row[slot_col] = -(cin_row[v] + 1)
            wrote.add(row[0])
            rows.append(tuple(row))
        segments.append(StaticSegment(
            rows=tuple(rows), carry_in=cin,
            carry_out=tuple(sorted(carry_out[s])),
            exports=tuple(seg_exports[s])))
    return SegmentedProgram(
        segments=tuple(segments), pool_size=prog.pool_size,
        n_exp=len(prog.exports),
        export_clv_map=dict(prog.export_clv_map),
        export_scaler_map=dict(prog.export_scaler_map))


def _tree_kernel_static_seg(pmat_ref, ptq_ref, tip_ref,
                            carry_ref, cscal_ref,
                            clv_out, scal_out, cout, cscal_out,
                            pool, spool, exp_buf, exp_sems, carry_sems,
                            *, rows: tuple, states: int, rates: int,
                            parts: int, per_rate: bool, thresh: float,
                            factor: float, exports: tuple,
                            carry_out_slots: tuple):
    """One segment of the unrolled static sweep (semantics of
    _tree_kernel_static) with carried slots entering via carry_ref
    ([n_in, 1, n_terms*span, TB] bf16 stacked parts) and leaving via a
    carry-out DMA at segment end."""
    t = pl.program_id(0)
    tb = tip_ref.shape[-1]
    span = rates * states
    terms = STATIC_TERMS[parts]
    export_at = {}
    for local_idx, slot, e in exports:
        export_at[local_idx] = (e, slot)
    started = []

    kq = ptq_ref.shape[-1]
    tip_shifts = _tip_shift_rows(states, parts, kq, tb)

    def child(tip_idx, slot, is_tip, pm):
        if is_tip:
            tiprow = tip_ref[0, tip_idx]
            operand = ((tiprow[None, :] >> tip_shifts) & 1
                       ).astype(jnp.bfloat16)
            return ptq_ref[pm], operand, None
        if slot < 0:                      # carried from an earlier segment
            row = -(slot + 1)
            return (pmat_ref[pm], carry_ref[row, 0], cscal_ref[row, 0])
        return pmat_ref[pm], pool[slot], spool[slot]

    dn = (((1,), (0,)), ((), ()))
    for w, row in enumerate(rows):
        (p_slot, c1_tip, c1_slot, c1_is_tip,
         c2_tip, c2_slot, c2_is_tip, pm1, pm2) = row
        p1, c1, s1 = child(c1_tip, c1_slot, c1_is_tip, pm1)
        p2, c2, s2 = child(c2_tip, c2_slot, c2_is_tip, pm2)
        left = jax.lax.dot_general(p1, c1, dn,
                                   preferred_element_type=jnp.float32)
        right = jax.lax.dot_general(p2, c2, dn,
                                    preferred_element_type=jnp.float32)
        parent = left * right
        if per_rate:
            pr = parent.reshape(rates, states, tb)
            mask = jnp.max(pr, axis=1, keepdims=True) < thresh
            parent = jnp.where(mask, pr * factor, pr).reshape(span, tb)
            snew = mask[:, 0].astype(jnp.int32)
        else:
            mask = jnp.max(parent, axis=0, keepdims=True) < thresh
            parent = jnp.where(mask, parent * factor, parent)
            snew = mask.astype(jnp.int32)
        if s1 is not None:
            snew = snew + s1
        if s2 is not None:
            snew = snew + s2

        rem = parent
        split = []
        for j in range(parts):
            pj = rem.astype(jnp.bfloat16)
            split.append(pj)
            if j + 1 < parts:
                rem = rem - pj.astype(jnp.float32)
        pool[p_slot] = jnp.concatenate([split[j] for _, j in terms],
                                       axis=0)
        spool[p_slot] = snew

        if w in export_at:
            e, slot = export_at[w]
            e32 = jnp.int32(e)
            exp_buf[e32] = parent
            copies = (
                pltpu.make_async_copy(exp_buf.at[e32],
                                      clv_out.at[e32, t],
                                      exp_sems.at[e32, jnp.int32(0)]),
                pltpu.make_async_copy(spool.at[jnp.int32(slot)],
                                      scal_out.at[e32, t],
                                      exp_sems.at[e32, jnp.int32(1)]),
            )
            for c in copies:
                c.start()
            started.append(copies)

    for i, slot in enumerate(carry_out_slots):
        i32, s32 = jnp.int32(i), jnp.int32(slot)
        copies = (
            pltpu.make_async_copy(pool.at[s32], cout.at[i32, t],
                                  carry_sems.at[i32, jnp.int32(0)]),
            pltpu.make_async_copy(spool.at[s32], cscal_out.at[i32, t],
                                  carry_sems.at[i32, jnp.int32(1)]),
        )
        for c in copies:
            c.start()
        started.append(copies)

    for copies in started:
        for c in copies:
            c.wait()


def sweep_static_segmented(tip_blocked, pmatrix, prog: TreeVmemProgram,
                           cfg: PartitionConfig, tb: int,
                           interpret: bool = False,
                           seg_ops: Optional[int] = None):
    """Segmented topology-specialized sweep: same contract as
    sweep_static(), any op count (bounded by STATIC_SEG_MAX_OPS).
    seg_ops overrides the SEG_OPS segment length (tests)."""
    nt, tips, tb_in = tip_blocked.shape
    assert tb_in == tb and nt * tb == cfg.sites_padded
    R, S = cfg.rate_cats, cfg.states
    span = R * S
    parts = _parts_for(cfg)
    n_terms = len(STATIC_TERMS[parts])
    sr = R if cfg.per_rate_scalers else 1
    P = pmatrix.shape[0]
    kq = -(-(parts * S) // 16) * 16
    sprog = segment_static(prog, seg_ops=seg_ops)
    n_exp = sprog.n_exp

    pterms, ptq = _split_pmatrix_terms_static(pmatrix, parts)

    live: dict[int, tuple] = {}      # slot -> (cout, cscal, row)
    exp_parts = [None] * n_exp
    for seg in sprog.segments:
        n_in = max(len(seg.carry_in), 1)
        n_out = max(len(seg.carry_out), 1)
        if seg.carry_in:
            cin = jnp.stack([live[v][0][live[v][2]]
                             for v in seg.carry_in])
            cscal_in = jnp.stack([live[v][1][live[v][2]]
                                  for v in seg.carry_in])
        else:
            cin = jnp.zeros((1, nt, n_terms * span, tb), jnp.bfloat16)
            cscal_in = jnp.zeros((1, nt, sr, tb), jnp.int32)

        n_seg_exp = max(len(seg.exports), 1)
        local_exports = tuple((local_idx, slot, i) for i, (local_idx,
                              slot, _e) in enumerate(seg.exports))
        kernel = functools.partial(
            _tree_kernel_static_seg,
            rows=seg.rows, states=S, rates=R, parts=parts,
            per_rate=cfg.per_rate_scalers, thresh=cfg.scale_threshold,
            factor=cfg.scale_factor, exports=local_exports,
            carry_out_slots=seg.carry_out
            if seg.carry_out else (0,))

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(nt,),
            in_specs=[
                pl.BlockSpec((P, span, n_terms * span),
                             lambda t: (jnp.int32(0),) * 3,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((P, span, kq),
                             lambda t: (jnp.int32(0),) * 3,
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tips, tb),
                             lambda t: (t, jnp.int32(0), jnp.int32(0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_in, 1, n_terms * span, tb),
                             lambda t: (jnp.int32(0), t, jnp.int32(0),
                                        jnp.int32(0)),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_in, 1, sr, tb),
                             lambda t: (jnp.int32(0), t, jnp.int32(0),
                                        jnp.int32(0)),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ),
            scratch_shapes=[
                pltpu.VMEM((sprog.pool_size, n_terms * span, tb),
                           jnp.bfloat16),
                pltpu.VMEM((sprog.pool_size, sr, tb), jnp.int32),
                pltpu.VMEM((n_seg_exp, span, tb), jnp.float32),
                pltpu.SemaphoreType.DMA((n_seg_exp, 2)),
                pltpu.SemaphoreType.DMA((n_out, 2)),
            ],
        )

        clv_e, scal_e, cout, cscal_out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=(
                jax.ShapeDtypeStruct((n_seg_exp, nt, span, tb),
                                     jnp.float32),
                jax.ShapeDtypeStruct((n_seg_exp, nt, sr, tb),
                                     jnp.int32),
                jax.ShapeDtypeStruct((n_out, nt, n_terms * span, tb),
                                     jnp.bfloat16),
                jax.ShapeDtypeStruct((n_out, nt, sr, tb), jnp.int32),
            ),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=110 * 1024 * 1024,
            ),
            cost_estimate=pl.CostEstimate(
                flops=len(seg.rows) * nt * R * S * tb * (4 * S + 1),
                bytes_accessed=tips * nt * tb * 4,
                transcendentals=0,
            ),
            interpret=interpret,
        )(pterms, ptq, tip_blocked, cin, cscal_in)

        for i, slot in enumerate(seg.carry_out):
            live[slot] = (cout, cscal_out, i)
        for i, (local_idx, slot, e) in enumerate(seg.exports):
            exp_parts[e] = (clv_e, scal_e, i)

    clv_rows = jnp.stack([exp_parts[e][0][exp_parts[e][2]]
                          for e in range(n_exp)])
    scal_rows = jnp.stack([exp_parts[e][1][exp_parts[e][2]]
                           for e in range(n_exp)])
    return clv_rows.reshape(n_exp, nt, R, S, tb), scal_rows
