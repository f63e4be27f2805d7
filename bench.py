"""Benchmark: CLV site-update throughput of the fused engine on TPU vs. the
reference libpll-2 AVX2 kernels on the host CPU.

Prints ONE JSON line:
  {"metric": "clv_site_updates_per_sec", "value": N,
   "unit": "site-updates/s/chip", "vs_baseline": N / C-reference-AVX2}

One site-update = one CLV operation applied to one alignment column over all
rate categories (the unit implied by the reference's speed harness,
test/runtest.py speed mode).  The baseline is measured, not assumed
(BASELINE.md: no published absolute numbers exist).
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent

TIPS = int(os.environ.get("BENCH_TIPS", 256))
SITES = int(os.environ.get("BENCH_SITES", 65536))
RATE_CATS = 4
REPS = int(os.environ.get("BENCH_REPS", 64))


def measure_reference() -> float:
    """Build + run the C AVX2 anchor; returns site-updates/sec."""
    oracle = REPO / "oracle"
    bench_bin = oracle / "build" / "bench_ref"
    if not bench_bin.exists():
        subprocess.run(["cmake", "-B", "build", "-S", ".",
                        "-DCMAKE_BUILD_TYPE=Release"],
                       cwd=oracle, check=True, capture_output=True)
        subprocess.run(["cmake", "--build", "build", "-j8"],
                       cwd=oracle, check=True, capture_output=True)
    # smaller workload for the CPU reference; throughput is size-independent
    # once sites are large enough to amortize
    out = subprocess.run([str(bench_bin), str(min(TIPS, 128)), "32768",
                          str(RATE_CATS), "5"],
                         capture_output=True, text=True, check=True,
                         timeout=600)
    for line in out.stdout.splitlines():
        if line.startswith("site_updates_per_sec"):
            return float(line.split()[1])
    raise RuntimeError(f"bench_ref output unparseable: {out.stdout}")


def measure_engine() -> tuple[float, float, int]:
    import jax
    import jax.numpy as jnp

    # NOTE: the persistent compilation cache is deliberately NOT enabled
    # here: through the axon tunnel a cache-MISS compile of a program
    # containing Pallas custom calls hangs indefinitely (reproduced with
    # a trivial kernel; warm loads work).  Pure-XLA surfaces (tests,
    # CPU examples) do enable it — see tests/conftest.py.

    from libpll2_tpu import engine
    from libpll2_tpu import tree as T
    from libpll2_tpu.config import PartitionConfig
    from libpll2_tpu.models.gamma import compute_gamma_cats
    from libpll2_tpu.tree.generate import balanced_newick, random_tipchars

    print(f"devices: {jax.devices()}", file=sys.stderr)

    tree = T.parse_newick_string(balanced_newick(TIPS))
    cfg = PartitionConfig(
        tips=TIPS, clv_buffers=tree.inner_count, states=4, sites=SITES,
        rate_matrices=1, prob_matrices=2 * TIPS - 3, rate_cats=RATE_CATS,
        scale_buffers=tree.inner_count, dtype=jnp.float32, site_block=128)
    program = engine.compile_tree(tree, cfg)
    model = engine.make_model(
        [[1.0, 2.0, 1.0, 1.0, 2.0, 1.0]], [[0.25, 0.25, 0.25, 0.25]],
        compute_gamma_cats(1.0, RATE_CATS), dtype=jnp.float32)

    rng = np.random.default_rng(0)
    raw = random_tipchars(TIPS, cfg.sites_alloc, rng)
    tipchars = jnp.asarray(engine.pad_tipchars(raw, cfg))
    pattern_weights = np.zeros(cfg.sites_padded, dtype=np.float32)
    pattern_weights[:SITES] = 1.0
    pattern_weights = jnp.asarray(pattern_weights)
    invariant = jnp.asarray(np.full(cfg.sites_padded, -1, dtype=np.int32))
    bl = jnp.asarray(program.default_branch_lengths, jnp.float32)

    t0 = time.time()
    logl = engine.loglikelihood(program, cfg, model, bl, tipchars,
                                pattern_weights, invariant)
    jax.block_until_ready(logl)
    print(f"compile+first run: {time.time() - t0:.1f}s  logl={float(logl)}",
          file=sys.stderr)

    # on-chip kernel parity: the Pallas sweep and the XLA einsum path must
    # price the same tree identically (the reference's all-variants-one-
    # golden-file rule, test/runtest.py:44-56, applied on real hardware)
    import dataclasses
    cfg_xla = dataclasses.replace(cfg, use_pallas=False)
    logl_xla = engine.loglikelihood(program, cfg_xla, model, bl, tipchars,
                                    pattern_weights, invariant)
    parity = abs(float(logl) - float(logl_xla)) / abs(float(logl_xla))
    print(f"kernel parity: pallas={float(logl)} xla={float(logl_xla)} "
          f"rel={parity:.2e}", file=sys.stderr)
    assert parity < 5e-6, \
        f"Pallas/XLA logL disagree on chip: rel error {parity}"

    # REPS data-dependent iterations inside ONE jitted lax.scan: a single
    # dispatch measures pure device time (host/tunnel RPC latency excluded,
    # and no risk of duplicate-execution caching or overlap between
    # independent dispatches skewing the clock).  All large arrays are
    # explicit ARGUMENTS: closing over them embeds them as HLO constants,
    # which costs ~400s of extra cold-compile through the remote-compile
    # tunnel (tools/scanprobe.py isolates this).
    @jax.jit
    def chain(bl0, tipchars, pattern_weights, invariant):
        def body(carry, _):
            r = engine.loglikelihood(program, cfg, model,
                                     bl0 * (1.0 + 1e-12 * carry),
                                     tipchars, pattern_weights, invariant)
            return r, r
        last, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=REPS)
        return last

    jax.block_until_ready(chain(bl, tipchars, pattern_weights,
                                invariant))     # compile
    dt = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(bl * 1.0000001, tipchars,
                                    pattern_weights, invariant))
        dt = min(dt, (time.perf_counter() - t0) / REPS)

    num_ops = TIPS - 2
    updates_per_sec = num_ops * SITES / dt
    return updates_per_sec, dt, num_ops, parity


def main() -> None:
    ours, latency, num_ops, parity = measure_engine()
    try:
        ref = measure_reference()
    except Exception as exc:  # noqa: BLE001
        print(f"reference bench failed: {exc}", file=sys.stderr)
        ref = float("nan")
    print(f"engine: {ours:.3e} site-updates/s "
          f"(full-tree logL latency {latency * 1e3:.2f} ms, {num_ops} ops, "
          f"{SITES} sites); reference AVX2: {ref:.3e}", file=sys.stderr)
    print(json.dumps({
        "metric": "clv_site_updates_per_sec",
        "value": ours,
        "unit": "site-updates/s/chip",
        "vs_baseline": ours / ref if ref == ref else None,
        "kernel_parity_rel_err": parity,
    }))


if __name__ == "__main__":
    main()
