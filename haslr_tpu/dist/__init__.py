"""Multi-chip scaling: device meshes, data-parallel long-read streaming,
psum-merged edge support.

The reference is single-node (SURVEY.md §2.3); the TPU-native mapping is:
the SR-contig/minimizer index is replicated per host, long reads stream
data-parallel across the mesh, per-edge support counts merge with
``jax.lax.psum``, and graph cleaning runs replicated on the reduced
backbone.
"""
