"""Parsimony subsystem: weighted (Sankoff) DP and bit-parallel (Fitch)
scoring, plus randomized stepwise-addition tree building
(reference: libpll-2 src/parsimony.c, src/fast_parsimony.c,
src/stepwise.c)."""
from .sankoff import Parsimony, ParsBuildOp, ParsRecOp
from .fitch import FastParsimony

__all__ = ["Parsimony", "ParsBuildOp", "ParsRecOp", "FastParsimony"]
