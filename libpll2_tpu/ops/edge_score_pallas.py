"""Fused Pallas edge scorer: sumtable + Newton + logL per regraft slot.

The SPR search's inner loop prices one (prune candidate, regraft edge)
pair: build the edge's branch-invariant sumtable, run a few Newton steps
on the branch length, and evaluate the log-likelihood at the refined
length (reference semantics: pll_update_sumtable_ii +
pll_core_likelihood_derivatives + the cat0 likelihood tail,
core_derivatives.c:321-929).  On the XLA path each of those is a
separate HBM-roundtrip kernel over a [R, S, T] slab, so one slot costs
~15 passes over its sumtable; measured ~75x off the VPU roofline.

This kernel does the WHOLE slot in VMEM.  The ball recursion assigns
scratch slots in score-slot order (build_ball emits ops in level order
and every op IS one score slot), so the away messages are CONSECUTIVE
rows — the caller pre-gathers the remaining per-slot operands (facing
base message, half-P) into slot order with cheap XLA row-takes, and the
kernel's grid fetches B slots per step as plain consecutive blocks (no
dynamic index maps, B-fold fewer DMA issues — the v1 one-slot-per-step
form measured ~19 us/slot, DMA-issue bound).  Per slot:

    st = (L_bd @ ((H_bd @ away) * (H_bd @ other))) * (R_bd @ sub)

      H_bd  block-diag of the half-branch P matrices (per edge)
      L_bd  block-diag of inv_eigenvecs^T * diag(freqs)  (per model)
      R_bd  block-diag of eigenvecs                      (per model)

then Newton entirely on-chip: per iteration three sublane-reductions of
st against a0 = rw*(1-pinv)*exp(x*t) and its x-, x^2-scaled variants
give (lk0, lk1, lk2)[T]; (d1, d2) are the pattern-weighted site sums;
the update keeps the reference's fallback (halve/double on wrong
curvature) plus a non-finite guard.  The final score is
sum(w * (log(lk0) + scalers * log_thresh)).

Restrictions (callers fall back to the XLA scorer otherwise): per-site
scalers, no ascertainment bias, invariant-site indices all -1 (+I still
supported through prop_invar — the inv_lk term is zero when no site is
marked invariant).  f32.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HIGHEST = jax.lax.Precision.HIGHEST

SLOT_BLOCK = 4        # score slots per grid step


def _kernel(t0_ref,                        # [N] int32 (scalar prefetch,
            #                                fixed-point 1e-7 branch len)
            away_ref,                      # (B, span, T) ball messages
            other_ref,                     # (B, span, T) facing base rows
            sub_ref,                       # (1, span, T) candidate subtree
            hbd_ref,                       # (B, span, span) edge half-P
            scal_ref,                      # (B, 1, T) summed scaler rows
            lbd_ref, rbd_ref,              # (span, span) model constants
            xw_ref,                        # (span, 2): x | rw*(1-pinv)
            pw_ref,                        # (1, T) pattern weights
            score_ref, t3_ref,             # (B, 1, 1) outputs
            *, newton_iters: int, log_thresh: float):
    i = pl.program_id(0)
    dn = (((1,), (0,)), ((), ()))

    x = xw_ref[:, 0:1]                                     # [span, 1]
    w0 = xw_ref[:, 1:2]
    pw = pw_ref[0]                                         # [T]
    live = pw > 0.0
    wlive = jnp.where(live, pw, 0.0)
    rig = jax.lax.dot_general(rbd_ref[...], sub_ref[0], dn,
                              preferred_element_type=jnp.float32)

    for b in range(SLOT_BLOCK):
        # fixed-point 1e-7 start (Mosaic can't bitcast SMEM scalars); a
        # <=5e-8 perturbation of the Newton STARTING value is immaterial
        t0 = t0_ref[i * SLOT_BLOCK + b].astype(jnp.float32) * 1e-7
        hbd = hbd_ref[b]                                   # [span, span]
        ta = jax.lax.dot_general(hbd, away_ref[b], dn,
                                 preferred_element_type=jnp.float32)
        tb = jax.lax.dot_general(hbd, other_ref[b], dn,
                                 preferred_element_type=jnp.float32)
        lef = jax.lax.dot_general(lbd_ref[...], ta * tb, dn,
                                  preferred_element_type=jnp.float32)
        st = lef * rig                                     # [span, T]

        def lks(t, st=st):
            a0 = w0 * jnp.exp(x * t)                       # [span, 1]
            lk0 = jnp.sum(st * a0, axis=0)                 # [T]
            lk1 = jnp.sum(st * (x * a0), axis=0)
            lk2 = jnp.sum(st * (x * x * a0), axis=0)
            return lk0, lk1, lk2

        def newton_step(_, t, lks=lks):
            lk0, lk1, lk2 = lks(t)
            safe0 = jnp.where(live, lk0, 1.0)
            deriv1 = -lk1 / safe0
            deriv2 = deriv1 * deriv1 - lk2 / safe0
            d1 = jnp.sum(wlive * deriv1)
            d2 = jnp.sum(wlive * deriv2)
            newton = t - d1 / d2
            fallback = jnp.where(d1 > 0, t * 0.5, t * 2.0)
            t_new = jnp.where(d2 > 0, newton, fallback)
            t_new = jnp.where(jnp.isfinite(t_new), t_new, t)
            return jnp.clip(t_new, 1e-8, 100.0)

        t3 = jax.lax.fori_loop(0, newton_iters, newton_step, t0)

        lk0, _, _ = lks(t3)
        safe0 = jnp.where(live, lk0, 1.0)
        scal = scal_ref[b, 0].astype(jnp.float32)          # [T]
        site_lk = jnp.log(safe0) + scal * log_thresh
        # Mosaic cannot store scalars to VMEM — write (1, 1) blocks
        score_ref[b] = jnp.sum(wlive * site_lk).reshape(1, 1)
        t3_ref[b] = t3.reshape(1, 1)


@functools.partial(jax.jit,
                   static_argnames=("slots_per_cand", "newton_iters",
                                    "log_thresh", "interpret"))
def edge_scores(t0q, away, other, sub, hbd, scal_rows, lbd, rbd, xw, pw,
                *, slots_per_cand: int, newton_iters: int,
                log_thresh: float, interpret: bool = False):
    """Score N slots (see module docstring).  N must be a multiple of
    SLOT_BLOCK, and slots_per_cand (= Vg) a multiple of SLOT_BLOCK too so
    every grid step stays inside one candidate (compile_spr pads groups
    to multiples of 16).

    t0q:       [N] int32 starting branch lengths, fixed-point 1e-7
    away:      [N, span, T] f32 ball messages in slot order
    other:     [N, span, T] f32 facing base rows (pre-gathered)
    sub:       [N // slots_per_cand, span, T] f32 per-candidate subtree CLV
    hbd:       [N, span, span] f32 half-branch block-diag P (pre-gathered)
    scal_rows: [N, T] int32 pre-summed scaler rows (away + other + sub)
    lbd, rbd:  [span, span] f32 model constants
    xw:        [span, 2] f32: eigenvalue*ki | rate_weight*(1-pinv)
    pw:        [1, T] f32 pattern weights (0 on padding)
    Returns (scores [N], t3 [N]) f32.
    """
    n, span, t_sites = away.shape
    assert n % SLOT_BLOCK == 0 and slots_per_cand % SLOT_BLOCK == 0
    scal3 = scal_rows[:, None, :]
    cand_of_step = slots_per_cand // SLOT_BLOCK

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // SLOT_BLOCK,),
        in_specs=[
            pl.BlockSpec((SLOT_BLOCK, span, t_sites),
                         lambda i, t0: (i, 0, 0)),
            pl.BlockSpec((SLOT_BLOCK, span, t_sites),
                         lambda i, t0: (i, 0, 0)),
            pl.BlockSpec((1, span, t_sites),
                         lambda i, t0: (i // cand_of_step, 0, 0)),
            pl.BlockSpec((SLOT_BLOCK, span, span),
                         lambda i, t0: (i, 0, 0)),
            pl.BlockSpec((SLOT_BLOCK, 1, t_sites),
                         lambda i, t0: (i, 0, 0)),
            pl.BlockSpec((span, span), lambda i, t0: (0, 0)),
            pl.BlockSpec((span, span), lambda i, t0: (0, 0)),
            pl.BlockSpec((span, 2), lambda i, t0: (0, 0)),
            pl.BlockSpec((1, t_sites), lambda i, t0: (0, 0)),
        ],
        out_specs=(
            pl.BlockSpec((SLOT_BLOCK, 1, 1), lambda i, t0: (i, 0, 0)),
            pl.BlockSpec((SLOT_BLOCK, 1, 1), lambda i, t0: (i, 0, 0)),
        ),
    )

    kernel = functools.partial(_kernel, newton_iters=newton_iters,
                               log_thresh=log_thresh)
    scores, t3 = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n, 1, 1), jnp.float32),
            jax.ShapeDtypeStruct((n, 1, 1), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=n * span * t_sites * (8 * span // 16 + 3 * newton_iters),
            bytes_accessed=n * (2 * span + 2) * t_sites * 4,
            transcendentals=n * t_sites,
        ),
        interpret=interpret,
    )(t0q, away, other, sub, hbd, scal3, lbd, rbd, xw, pw)
    return scores[:, 0, 0], t3[:, 0, 0]


def model_constants(model, cfg):
    """L_bd, R_bd [span, span] and xw [span, 2] from a Model (see module
    docstring); pure XLA, call outside the kernel."""
    R, S = cfg.rate_cats, cfg.states
    dtype = jnp.float32
    evecs = model.eigenvecs[model.params_indices].astype(dtype)    # [R,S,S]
    inv_evecs = model.inv_eigenvecs[model.params_indices].astype(dtype)
    freqs = model.cat_freqs.astype(dtype)                          # [R, S]
    evals = model.eigenvals[model.params_indices].astype(dtype)    # [R, S]
    pinv = model.cat_pinv.astype(dtype)                            # [R]
    rw = model.rate_weights.astype(dtype)                          # [R]
    rates = model.rates.astype(dtype)

    # M_L[r][j, k] = inv_evecs[r][k, j] * freqs[r][k]; block-diagonal
    # layout: out[r*S+j, q*S+k] = M[r, j, k] * (r == q)
    ml = jnp.einsum("rkj,rk->rjk", inv_evecs, freqs, precision=HIGHEST)
    eye = jnp.eye(R, dtype=dtype)
    lbd = jnp.einsum("rjk,rq->rjqk", ml, eye,
                     precision=HIGHEST).reshape(R * S, R * S)
    rbd = jnp.einsum("rjk,rq->rjqk", evecs, eye,
                     precision=HIGHEST).reshape(R * S, R * S)
    ki = rates / (1.0 - pinv)                                      # [R]
    x = (evals * ki[:, None]).reshape(R * S)
    pf = jnp.where(pinv > 0, 1.0 - pinv, 1.0)
    w0 = jnp.repeat(rw * pf, S)
    return lbd, rbd, jnp.stack([x, w0], axis=1)                    # [span,2]
