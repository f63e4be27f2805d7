"""Drive the fast SPR search end-to-end on the current JAX backend.

Times one full hill-climb on a scrambled random topology over simulated
DNA, reporting per-round wall time, compile counts and the logL trace.
On TPU (f32) this is the VERDICT-scale check: a 100-250 taxon SPR round
must take seconds, with each device program compiling exactly once.

Usage: python tools/profile_search.py [tips] [sites] [rounds]
"""
from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

import libpll2_tpu as pll  # noqa: E402
from libpll2_tpu import engine, search_fast  # noqa: E402
from libpll2_tpu import tree as T  # noqa: E402
from libpll2_tpu.config import PartitionConfig  # noqa: E402
from libpll2_tpu.tree.generate import random_tipchars  # noqa: E402
from libpll2_tpu.tree.utree import export_newick  # noqa: E402


def random_newick(n, rng):
    labels = [f"t{i}" for i in range(n)]
    # random sequential attachment
    from libpll2_tpu.tree.utree import UNode

    def inner3():
        a, b, c = UNode(), UNode(), UNode()
        a.next, b.next, c.next = b, c, a
        return a

    core = inner3()
    tips = []
    for h in core.roundabout():
        t = UNode(None, float(rng.uniform(0.02, 0.4)))
        t.back = h
        h.back = t
        h.length = t.length
        tips.append(t)
    edges = [h for h in core.roundabout()]
    for _ in range(n - 3):
        e = edges[rng.integers(len(edges))]
        t = UNode(None, float(rng.uniform(0.02, 0.4)))
        j = inner3()
        j2, j3 = j.next, j.next.next
        old_back, old_len = e.back, e.length
        half = old_len / 2
        e.back = j
        j.back = e
        e.length = j.length = half
        j2.back = old_back
        old_back.back = j2
        j2.length = old_back.length = half
        j3.back = t
        t.back = j3
        j3.length = t.length
        tips.append(t)
        edges.extend([j2, j3])
    for i, t in enumerate(tips):
        t.label = labels[i]
    return export_newick(tips[0].back, precision=None)


def main():
    tips = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    sites = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    max_rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 4

    on_tpu = jax.default_backend() not in ("cpu",)
    dtype = jnp.float32 if on_tpu else jnp.float64
    print(f"backend={jax.default_backend()} dtype={dtype.__name__} "
          f"tips={tips} sites={sites}", file=sys.stderr)

    rng = np.random.default_rng(3)
    tree = T.parse_newick_string(random_newick(tips, rng))
    raw = random_tipchars(tips, sites, rng)
    chars = {n.label: raw[n.clv_index].astype(np.uint64)
             for n in tree.nodes[:tips]}

    cfg = PartitionConfig(
        tips=tips, clv_buffers=tree.inner_count, states=4, sites=sites,
        rate_matrices=1, prob_matrices=2 * tips - 3, rate_cats=4,
        scale_buffers=tree.inner_count, dtype=dtype)
    model = engine.make_model(
        [[1.0, 2.0, 1.0, 1.0, 2.0, 1.0]], [[0.25, 0.25, 0.25, 0.25]],
        pll.compute_gamma_cats(1.0, 4), dtype=dtype)

    t0 = time.time()
    prog = search_fast.compile_spr(tree, cfg)
    print(f"host compile_spr: {time.time() - t0:.2f}s  "
          f"C={prog.cand_edge.shape[0]} E={prog.edge_rows.shape[0]} "
          f"level_ops={prog.level_ops.shape}", file=sys.stderr)

    logl = None
    for r in range(max_rounds):
        t0 = time.time()
        prog, logl, applied = search_fast.spr_round(prog, model, chars)
        dt = time.time() - t0
        print(f"round {r}: logl={logl:.3f} moves={applied} "
              f"wall={dt:.2f}s", file=sys.stderr)
        if applied == 0:
            break
    t0 = time.time()
    prog = search_fast.smooth_branches(prog, model, chars)
    print(f"smooth: {time.time() - t0:.2f}s", file=sys.stderr)

    print(f"compiles: scores={search_fast._spr_all_scores._cache_size()} "
          f"logl={search_fast._logl_rt._cache_size()} "
          f"smooth={search_fast._smooth_rt._cache_size()}", file=sys.stderr)
    assert np.isfinite(logl), "non-finite logL"
    print("OK", logl)


if __name__ == "__main__":
    main()
