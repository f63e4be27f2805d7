"""Helper to run the reference-implementation oracle driver.

The oracle (oracle/oracle_driver.c) links the reference libpll-2 numeric
layers and interprets a small script language; we use it to extract golden
values at full precision.  Built on first use; results can be cached by the
calling test via pytest fixtures.
"""
from __future__ import annotations

import os
import subprocess
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
ORACLE_DIR = REPO / "oracle"
ORACLE_BIN = ORACLE_DIR / "build" / "oracle_driver"


def ensure_oracle() -> Path:
    if not ORACLE_BIN.exists():
        subprocess.run(["cmake", "-B", "build", "-S", ".",
                        "-DCMAKE_BUILD_TYPE=Release"],
                       cwd=ORACLE_DIR, check=True, capture_output=True)
        subprocess.run(["cmake", "--build", "build", "-j8"],
                       cwd=ORACLE_DIR, check=True, capture_output=True)
    return ORACLE_BIN


def run_oracle(script: str) -> dict:
    """Run a script; parse 'key values...' output lines.

    Repeated keys (e.g. several 'derivatives' lines) accumulate into lists.
    """
    ensure_oracle()
    proc = subprocess.run([str(ORACLE_BIN)], input=script,
                          capture_output=True, text=True, timeout=300)
    if proc.returncode != 0:
        raise RuntimeError(f"oracle failed: {proc.stderr}\nscript:\n{script}")
    out: dict = {}
    for line in proc.stdout.splitlines():
        parts = line.split()
        if not parts:
            continue
        key, vals = parts[0], parts[1:]
        if key in ("derivatives",):
            out.setdefault(key, []).append(np.array(vals, dtype=np.float64))
        elif key in ("pmatrix", "clv", "eigenvals", "eigenvecs",
                     "inv_eigenvecs"):
            # first value is the buffer index
            out.setdefault(key, {})[int(vals[0])] = \
                np.array(vals[1:], dtype=np.float64)
        elif key == "scaler":
            out.setdefault(key, {})[int(vals[0])] = \
                np.array(vals[1:], dtype=np.int64)
        elif key in ("root_logl", "edge_logl"):
            out.setdefault(key, []).append(float(vals[0]))
        elif key == "pars_anc":
            out.setdefault(key, {})[int(vals[0])] = vals[1]
        elif key in ("stepwise_tree", "spr_tree", "svg_written"):
            out[key] = vals[0]
        elif key in ("stepwise_cost", "spr_cost"):
            out[key] = int(vals[0])
        elif key in ("fastpars_edge", "fastpars_root"):
            out.setdefault(key, []).append(int(vals[0]))
        elif key in ("fastpars_const", "fastpars_informative",
                     "pars_build_score", "pars_score"):
            out[key] = float(vals[0])
        else:
            out[key] = np.array(vals, dtype=np.float64)
    return out
