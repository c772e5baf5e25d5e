"""Pallas TPU kernels: the numeric engines of the assembler.

- ``nw``         batched banded Needleman-Wunsch alignment DP
- ``consensus``  batched align-to-draft + weighted pileup consensus
- ``kmer``       k-mer counting (short-read side)
- ``minimizer``  minimizer extraction (aligner seeding)
- ``chain``      seed chaining DP (aligner)

Every kernel has a pure-JAX reference path that runs on CPU (used by the
test suite on the virtual device mesh) and a Pallas TPU path selected when
running on TPU hardware.
"""
