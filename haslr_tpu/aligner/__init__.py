"""Long-read → SR-contig aligner: minimizer seeding + chain + extend.

From-scratch replacement for the minimap2 stage of the pipeline
(reference ``bin/haslr.py:81-110``: ``minimap2 -t T --secondary=no -c
{preset} contigs.fa lr.fasta``), emitting PAF with ``cg:Z`` CIGARs.

Presets mirror the reference driver's read-type mapping
(``bin/haslr.py:90-95``): corrected ``k=19``, pacbio ``k=17`` with
homopolymer compression, nanopore ``k=15``; all with minimizer window
``w=10`` (minimap2's map-preset default).
"""

from haslr_tpu.aligner.map import PRESETS, map_reads  # noqa: F401
