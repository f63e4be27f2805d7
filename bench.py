"""Benchmark: CLV site-update throughput of the fused engine on TPU vs. the
reference libpll-2 AVX2 kernels on the host CPU.

Prints ONE JSON line; primary metric:
  {"metric": "clv_site_updates_per_sec", "value": N,
   "unit": "site-updates/s/chip", "vs_baseline": N / C-reference-AVX2}
plus an "extra" object carrying the full BASELINE.md metric set: a taxa
sweep (64/256/1024), protein S=20 throughput, the production SPR search
round time, and cold-compile latency — each engine case asserts on-chip
Pallas/XLA logL parity before it is timed.

One site-update = one CLV operation applied to one alignment column over
all rate categories (the unit implied by the reference's speed harness,
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
FULL = os.environ.get("BENCH_FULL", "1") != "0"   # extra metric set


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


def _enable_cache():
    """Persistent compilation cache: round-3's Pallas cache-miss hang is
    no longer reproducible (tools/cacheprobe.py), and the real static
    kernel loads warm in ~2 s vs a ~45 s cold compile."""
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      str(REPO / ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def measure_case(tips: int, sites: int, states: int = 4,
                 reps: int = REPS, precision: str = "highest") -> dict:
    """Throughput + latency + on-chip kernel parity for one engine case.

    precision: pallas split-K precision mode — "highest" (full f32
    term math, the primary numbers) or "high" (3-term split, measured
    rel err ~1e-6; the documented fast mode)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    _enable_cache()

    from libpll2_tpu import engine
    from libpll2_tpu import tree as T
    from libpll2_tpu.config import PartitionConfig
    from libpll2_tpu.models.gamma import compute_gamma_cats
    from libpll2_tpu.tree.generate import balanced_newick, random_tipchars

    tree = T.parse_newick_string(balanced_newick(tips))
    cfg = PartitionConfig(
        tips=tips, clv_buffers=tree.inner_count, states=states, sites=sites,
        rate_matrices=1, prob_matrices=2 * tips - 3, rate_cats=RATE_CATS,
        scale_buffers=tree.inner_count, dtype=jnp.float32, site_block=128,
        pallas_precision=precision)
    program = engine.compile_tree(tree, cfg)
    if states == 20:
        from libpll2_tpu.models.aa import aa_model
        rates, freqs = aa_model("lg")
        model = engine.make_model([rates], [freqs],
                                  compute_gamma_cats(1.0, RATE_CATS),
                                  dtype=jnp.float32)
    else:
        model = engine.make_model(
            [[1.0, 2.0, 1.0, 1.0, 2.0, 1.0]],
            [[1.0 / states] * states],
            compute_gamma_cats(1.0, RATE_CATS), dtype=jnp.float32)

    rng = np.random.default_rng(0)
    raw = random_tipchars(tips, cfg.sites_alloc, rng, states=states)
    tipchars = jnp.asarray(engine.pad_tipchars(raw, cfg))
    pattern_weights = np.zeros(cfg.sites_padded, dtype=np.float32)
    pattern_weights[:sites] = 1.0
    pattern_weights = jnp.asarray(pattern_weights)
    invariant = jnp.asarray(np.full(cfg.sites_padded, -1, dtype=np.int32))
    bl = jnp.asarray(program.default_branch_lengths, jnp.float32)

    t0 = time.time()
    logl = engine.loglikelihood(program, cfg, model, bl, tipchars,
                                pattern_weights, invariant)
    jax.block_until_ready(logl)
    cold_s = time.time() - t0
    print(f"[{tips}x{sites} S={states}] compile+first run: {cold_s:.1f}s  "
          f"logl={float(logl)}", file=sys.stderr)
    assert np.isfinite(float(logl)), "non-finite logL on chip"

    # on-chip kernel parity: the Pallas sweep and the XLA einsum path must
    # price the same tree identically (the reference's all-variants-one-
    # golden-file rule, test/runtest.py:44-56, applied on real hardware)
    cfg_xla = dataclasses.replace(cfg, use_pallas=False)
    logl_xla = engine.loglikelihood(program, cfg_xla, model, bl, tipchars,
                                    pattern_weights, invariant)
    parity = abs(float(logl) - float(logl_xla)) / abs(float(logl_xla))
    print(f"[{tips}x{sites} S={states}] parity: pallas={float(logl)} "
          f"xla={float(logl_xla)} rel={parity:.2e}", file=sys.stderr)
    assert parity < (5e-6 if precision == "highest" else 5e-5), \
        f"Pallas/XLA logL disagree on chip: rel error {parity}"

    # REPS data-dependent iterations inside ONE jitted lax.scan: a single
    # dispatch measures pure device time (host/tunnel RPC latency excluded,
    # and no risk of duplicate-execution caching or overlap between
    # independent dispatches skewing the clock).  All large arrays are
    # explicit ARGUMENTS: closing over them embeds them as HLO constants,
    # which costs ~400s of extra cold-compile through the remote-compile
    # tunnel (tools/scanprobe.py isolates this).
    import jax

    @jax.jit
    def chain(bl0, tipchars, pattern_weights, invariant):
        def body(carry, _):
            r = engine.loglikelihood(program, cfg, model,
                                     bl0 * (1.0 + 1e-12 * carry),
                                     tipchars, pattern_weights, invariant)
            return r, r
        last, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=reps)
        return last

    jax.block_until_ready(chain(bl, tipchars, pattern_weights,
                                invariant))     # compile
    dt = float("inf")
    for _ in range(5):
        t0 = time.perf_counter()
        jax.block_until_ready(chain(bl * 1.0000001, tipchars,
                                    pattern_weights, invariant))
        dt = min(dt, (time.perf_counter() - t0) / reps)

    num_ops = tips - 2
    return {
        "tips": tips, "sites": sites, "states": states,
        "updates_per_sec": num_ops * sites / dt,
        "full_tree_logl_ms": dt * 1e3,
        "cold_compile_s": cold_s,
        "kernel_parity_rel_err": parity,
    }


def measure_search_scale(tips=1024, sites=4096, radius=5,
                         rounds=4) -> dict:
    """Production-SCALE search point: steady round time at 1024 taxa
    (the regime the radius-limited scoring exists for; the reference's
    2000-taxon test data role, test/Makefile DEPFILES).  Short run —
    recovery at this scale needs ~30+ rounds and is covered by the
    256-taxon case; this pins the per-round cost and move throughput."""
    import jax.numpy as jnp

    from libpll2_tpu import engine, search_fast
    from libpll2_tpu import tree as T
    from libpll2_tpu.config import PartitionConfig
    from libpll2_tpu.models.gamma import compute_gamma_cats
    from libpll2_tpu.tree.generate import random_newick, simulate_alignment

    rng = np.random.default_rng(1)
    rates = compute_gamma_cats(1.0, RATE_CATS)
    subst = [1.0, 2.0, 1.0, 1.0, 2.0, 1.0]
    freqs = [0.25] * 4
    truth = T.parse_newick_string(
        random_newick(tips, rng, min_bl=0.03, max_bl=0.3))
    chars = simulate_alignment(truth, sites, rng, subst, freqs, rates)
    start = T.parse_newick_string(
        random_newick(tips, rng, min_bl=0.05, max_bl=0.3))
    ren = dict(zip(sorted(n.label for n in start.nodes[:tips]),
                   sorted(chars)))
    for n in start.nodes[:tips]:
        n.label = ren[n.label]
    cfg = PartitionConfig(
        tips=tips, clv_buffers=start.inner_count, states=4, sites=sites,
        rate_matrices=1, prob_matrices=2 * tips - 3, rate_cats=RATE_CATS,
        scale_buffers=start.inner_count, dtype=jnp.float32)
    model = engine.make_model([subst], [freqs], rates, dtype=jnp.float32)
    _f, _l, stats = search_fast.hill_climb(
        start, cfg, model, chars, max_rounds=rounds, radius=radius,
        smooth_every=0)
    rs = stats["round_secs"]
    steady = float(np.median(rs[1:])) if len(rs) > 1 else rs[0]
    print(f"[search-{tips}] rounds={stats['rounds']} "
          f"moves={stats['moves']} steady={steady:.2f}s", file=sys.stderr)
    return {"tips": tips, "sites": sites, "radius": radius,
            "first_round_s": rs[0], "steady_round_s": steady,
            "moves": stats["moves"]}


def measure_search_round() -> dict:
    """Steady-state production SPR round (search_fast, radius 5) at
    256 taxa x 4096 sites — the workload the reference exists to power.

    Reports per-phase wall time (score / select / apply / verify) for the
    steady rounds, jit-cache counters, AND search quality: normalized RF
    distance to the simulation truth plus Δ logL vs the (smoothed) true
    tree — speed without a recovery metric measures the wrong thing."""
    import jax
    import jax.numpy as jnp

    from libpll2_tpu import engine, search_fast
    from libpll2_tpu import tree as T
    from libpll2_tpu.config import PartitionConfig
    from libpll2_tpu.models.gamma import compute_gamma_cats
    from libpll2_tpu.tree.compare import rf_distance_normalized
    from libpll2_tpu.tree.generate import random_newick, simulate_alignment

    tips, sites, radius = 256, 4096, 5
    rounds = int(os.environ.get("BENCH_SEARCH_ROUNDS", 30))
    rng = np.random.default_rng(20260820)
    rates = compute_gamma_cats(0.9, RATE_CATS)
    subst = [1.2, 2.7, 0.8, 1.1, 3.0, 1.0]
    freqs = [0.28, 0.24, 0.22, 0.26]
    tree = T.parse_newick_string(
        random_newick(tips, rng, min_bl=0.02, max_bl=0.35))
    chars = simulate_alignment(tree, sites, rng, subst, freqs, rates)
    start = T.parse_newick_string(
        random_newick(tips, rng, min_bl=0.05, max_bl=0.3))
    lab = sorted(chars)
    have = sorted(n.label for n in start.nodes[:tips])
    ren = dict(zip(have, lab))
    for n in start.nodes[:tips]:
        n.label = ren[n.label]

    cfg = PartitionConfig(
        tips=tips, clv_buffers=start.inner_count, states=4, sites=sites,
        rate_matrices=1, prob_matrices=2 * tips - 3, rate_cats=RATE_CATS,
        scale_buffers=start.inner_count, dtype=jnp.float32)
    model = engine.make_model([subst], [freqs], rates, dtype=jnp.float32)

    t0 = time.time()
    final, logl, stats = search_fast.hill_climb(
        start, cfg, model, chars, max_rounds=rounds, radius=radius,
        smooth_every=2)
    total = time.time() - t0
    rs = stats["round_secs"]
    steady = float(np.median(rs[1:])) if len(rs) > 1 else rs[0]

    # per-phase breakdown of the steady rounds (numeric keys only; the
    # timing dicts also carry shape/cache diagnostics).  MEDIAN per
    # phase: a mid-search shape-growth recompile (~12 s, at most once
    # or twice per climb) would dominate a mean
    steady_tms = stats["phase_timings"][1:] or stats["phase_timings"]
    phases = {}
    for k in {k for tm in steady_tms for k, v in tm.items()
              if isinstance(v, float)}:
        vals = [tm[k] for tm in steady_tms if isinstance(tm.get(k), float)]
        phases[k] = float(np.median(vals))
    cache_sizes = stats["phase_timings"][-1].get("cache")

    # search quality vs the simulation truth
    rf_start = rf_distance_normalized(start, tree)
    rf_final = rf_distance_normalized(final, tree)
    logl_true, _ = search_fast.evaluate_tree(tree, cfg, model, chars)
    print(f"[search] rounds={stats['rounds']} moves={stats['moves']} "
          f"first={rs[0]:.1f}s steady={steady:.2f}s total={total:.1f}s",
          file=sys.stderr)
    print(f"[search] phases(steady): "
          + " ".join(f"{k}={v:.2f}s" for k, v in sorted(phases.items())),
          file=sys.stderr)
    print(f"[search] quality: RF {rf_start:.3f} -> {rf_final:.3f}  "
          f"logl={logl:.1f} true={logl_true:.1f} "
          f"dlogl={logl - logl_true:.1f}", file=sys.stderr)
    return {"tips": tips, "sites": sites, "radius": radius,
            "first_round_s": rs[0], "steady_round_s": steady,
            "moves": stats["moves"], "phase_secs_steady": phases,
            "jit_cache_sizes": cache_sizes,
            "rf_start": rf_start, "rf_final": rf_final,
            "logl_final": logl, "logl_true_tree": logl_true,
            "delta_logl_vs_truth": logl - logl_true}


def main() -> None:
    if os.environ.get("BENCH_WARM_PROBE") == "1":
        # subprocess mode: report the warm-start compile of the primary
        # case through the persistent cache (populated by the parent).
        # reps MUST equal the parent's: the timing chain is a
        # lax.scan(length=reps) program, so a different reps is a
        # DIFFERENT program — a guaranteed Pallas cache-miss, which is
        # exactly the unbounded cold-compile this probe exists to rule
        # out (the round-4 900 s warm-probe timeout was this bug)
        r = measure_case(TIPS, SITES, 4, reps=REPS)
        print(json.dumps({"warm_compile_s": r["cold_compile_s"]}))
        return

    primary = measure_case(TIPS, SITES, 4)
    extra = {"dna_256": primary}
    if FULL:
        for tips, sites, states, prec, key in (
                (64, SITES, 4, "highest", "dna_64"),
                (1024, 16384, 4, "highest", "dna_1024"),
                (128, 16384, 20, "highest", "protein_128"),
                # documented fast mode: 3-term bf16 split ("high"),
                # measured logL rel err ~1e-6 on these cases
                (TIPS, SITES, 4, "high", "dna_256_high"),
                (128, 16384, 20, "high", "protein_128_high")):
            try:
                extra[key] = measure_case(tips, sites, states,
                                          precision=prec)
            except Exception as exc:  # noqa: BLE001
                print(f"extra case {key} failed: {exc}", file=sys.stderr)
                extra[key] = {"error": str(exc)[:200]}
        try:
            extra["search_round"] = measure_search_round()
        except Exception as exc:  # noqa: BLE001
            print(f"search bench failed: {exc}", file=sys.stderr)
            extra["search_round"] = {"error": str(exc)[:200]}
        try:
            extra["search_1024"] = measure_search_scale()
        except Exception as exc:  # noqa: BLE001
            print(f"scale search bench failed: {exc}", file=sys.stderr)
            extra["search_1024"] = {"error": str(exc)[:200]}
    if FULL:
        # warm-start probe: TWO fresh processes compiling the primary
        # case against the populated persistent cache.  Startup is
        # bimodal through the axon tunnel: the first fresh process pays
        # the terminal-side executable load (~45 s for the 254-op
        # static program even on a disk-cache hit); the second hits
        # the terminal's program cache (~2.6 s).  Both are reported —
        # steady_process_s is what a user restarting repeatedly gets.
        try:
            env = dict(os.environ, BENCH_WARM_PROBE="1")
            probes = []
            for _ in range(2):
                out = subprocess.run([sys.executable, __file__],
                                     capture_output=True, text=True,
                                     timeout=900, env=env)
                probes.append(json.loads(out.stdout.strip()
                                         .splitlines()[-1]))
            extra["warm_start"] = {
                "first_process_s": probes[0]["warm_compile_s"],
                "steady_process_s": probes[1]["warm_compile_s"],
                "warm_compile_s": probes[1]["warm_compile_s"],
            }
        except Exception as exc:  # noqa: BLE001
            print(f"warm probe failed: {exc}", file=sys.stderr)
            extra["warm_start"] = {"error": str(exc)[:200]}
    try:
        ref = measure_reference()
    except Exception as exc:  # noqa: BLE001
        print(f"reference bench failed: {exc}", file=sys.stderr)
        ref = float("nan")
    ours = primary["updates_per_sec"]
    print(f"engine: {ours:.3e} site-updates/s "
          f"(full-tree logL latency {primary['full_tree_logl_ms']:.2f} ms, "
          f"{TIPS - 2} ops, {SITES} sites); reference AVX2: {ref:.3e}",
          file=sys.stderr)
    print(json.dumps({
        "metric": "clv_site_updates_per_sec",
        "value": ours,
        "unit": "site-updates/s/chip",
        "vs_baseline": ours / ref if ref == ref else None,
        "kernel_parity_rel_err": primary["kernel_parity_rel_err"],
        "extra": extra,
    }))


if __name__ == "__main__":
    main()
