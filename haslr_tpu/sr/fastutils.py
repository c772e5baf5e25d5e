"""Read formatting and subsampling (fastutils replacement).

Replaces the fastutils invocations of the reference driver:

- ``format -i fofn -d --fofn``: rename reads to sequential numeric ids
  (``bin/haslr.py:227``) — required because the assembler parses PAF name
  columns as integers (``Longread.cpp:286-289``);
- ``format -i in -m N -c``: drop sequences shorter than N, keep comments
  (``bin/haslr.py:143``);
- ``subsample -i fofn -d D -g G -lnk --fofn``: keep the *longest* reads
  totalling D x G bases, renamed to numeric ids (``bin/haslr.py:247``).
"""

from __future__ import annotations

from haslr_tpu.core import io as cio


def format_rename(inputs: list[str], out_path: str) -> int:
    """Concatenate inputs, renaming records to 0..n-1 (fastutils format -d)."""
    n = 0
    with open(out_path, "w") as fp:
        for path in inputs:
            for rec in cio.read_fastx(path):
                fp.write(f">{n}\n{rec.seq}\n")
                n += 1
    return n


def format_min_len(in_path: str, out_path: str, min_len: int,
                   keep_comment: bool = True) -> int:
    """Length filter keeping comments (fastutils format -m N -c)."""
    n = 0
    with open(out_path, "w") as fp:
        for rec in cio.read_fastx(in_path):
            if len(rec.seq) < min_len:
                continue
            header = f">{rec.name}"
            if keep_comment and rec.comment:
                header += f" {rec.comment}"
            fp.write(f"{header}\n{rec.seq}\n")
            n += 1
    return n


def subsample_longest(
    inputs: list[str], out_path: str, depth: float, genome_size: int
) -> int:
    """Keep the longest reads totalling ``depth * genome_size`` bases,
    renamed to sequential numeric ids (fastutils subsample -lnk)."""
    reads = []
    for path in inputs:
        for rec in cio.read_fastx(path):
            reads.append(rec.seq)
    reads.sort(key=len, reverse=True)
    budget = depth * genome_size
    total = 0
    kept = []
    for seq in reads:
        if total >= budget:
            break
        kept.append(seq)
        total += len(seq)
    with open(out_path, "w") as fp:
        for i, seq in enumerate(kept):
            fp.write(f">{i}\n{seq}\n")
    return len(kept)
