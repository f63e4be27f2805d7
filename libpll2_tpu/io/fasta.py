"""FASTA reader.

Reference semantics (libpll-2 src/fasta.c): streaming record iterator with
a char-status filter — legal data characters are kept, cr/lf/tab/space/nul
silently stripped (with counts), anything else is fatal (fasta.c:27-60
chrstatus tables); headers start with '>' and everything after it up to
newline is the label.  pll_fasta_load (fasta.c:328-417) additionally
requires all sequences to have equal length when building an MSA — we keep
that check in load_fasta_msa but not in the iterator.
"""
from __future__ import annotations

import io
from typing import Iterator, Optional, TextIO, Tuple, Union

from .msa import MSA

_STRIP = set(" \t\r\n\x00\v\f")


class FastaError(ValueError):
    pass


def iter_fasta(source: Union[str, TextIO]) -> Iterator[Tuple[str, str]]:
    """Yield (header, sequence) records. `source` is a path or file object."""
    close = False
    if isinstance(source, str):
        fh: TextIO = open(source)
        close = True
    else:
        fh = source
    try:
        header: Optional[str] = None
        chunks: list[str] = []
        lineno = 0
        for line in fh:
            lineno += 1
            if line.startswith(">"):
                if header is not None:
                    yield header, "".join(chunks)
                header = line[1:].strip()
                chunks = []
            else:
                if header is None:
                    if line.strip() == "":
                        continue
                    raise FastaError(
                        f"Illegal data before first header (line {lineno})")
                kept = [c for c in line if c not in _STRIP]
                for c in kept:
                    if not (c.isalnum() or c in "-?*.!"):
                        raise FastaError(
                            f"Illegal character {c!r} on line {lineno}")
                chunks.append("".join(kept))
        if header is not None:
            yield header, "".join(chunks)
    finally:
        if close:
            fh.close()


def load_fasta_msa(source: Union[str, TextIO]) -> MSA:
    """Whole-file load into an MSA; mirrors pll_fasta_load (fasta.c:328)."""
    labels: list[str] = []
    seqs: list[str] = []
    if isinstance(source, str):
        from .. import native
        if native.available():
            try:
                labels, seqs = native.fasta_load(source)
            except ValueError as e:
                raise FastaError(str(e)) from None
    if not labels:
        for head, seq in iter_fasta(source):
            labels.append(head)
            seqs.append(seq)
    if not seqs:
        raise FastaError("empty FASTA file")
    if any(len(s) != len(seqs[0]) for s in seqs):
        raise FastaError("FASTA sequences differ in length (not an MSA)")
    return MSA(labels, seqs)


def load_fasta_string(text: str) -> MSA:
    return load_fasta_msa(io.StringIO(text))
