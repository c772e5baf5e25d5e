"""Read mapping: seed → chain → extend → PAF.

Drop-in stage for the reference's minimap2 invocation
(``bin/haslr.py:81-110``).  Per read: extract minimizers, look them up in
the replicated contig index, chain per (contig, relative strand), accept
chains greedily by score with <50% query overlap (the behavior
``--secondary=no`` exposes: one best alignment per read region, but a read
spanning several contigs yields several records), extend each accepted
chain to a full CIGAR, and emit PAF lines with ``cg:Z`` tags.

MAPQ follows minimap2's shape — ``60 * (1 - f2/f1) * min(1, n/10)`` where
f2 is the best query-overlapping competitor chain — giving 60 for unique
mappings and dropping sharply for repeats (HASLR keeps only MAPQ >= 55,
reference Longread.cpp:268).
"""

from __future__ import annotations

import numpy as np

from haslr_tpu.aligner import minimizer as mz
from haslr_tpu.aligner.chain import chain_anchors
from haslr_tpu.aligner.extend import chain_to_cigar
from haslr_tpu.aligner.index import MinimizerIndex
from haslr_tpu.core import cigar as ccigar
from haslr_tpu.core import io as cio
from haslr_tpu.core import seq as cseq

# read type -> (k, w, homopolymer-compression), mirroring bin/haslr.py:90-95
PRESETS = {
    "corrected": (19, 10, False),
    "pacbio": (17, 10, True),
    "nanopore": (15, 10, False),
}


def collect_anchors(idx: MinimizerIndex, codes: np.ndarray):
    """All (contig_id, rel_strand, t_pos, q_pos) anchors for one read.

    ``q_pos`` is in the frame of the read orientation that matches the
    target forward strand (i.e. for rel_strand==1 it is a position on the
    reverse-complemented read), which makes chaining and extension uniform;
    conversion back to original read coordinates happens at PAF emission.
    """
    rlen = len(codes)
    h, qp, qe, qs = mz.minimizers(codes, idx.k, idx.w, idx.hpc)
    lo, hi = idx.lookup(h)
    occ = hi - lo
    out = {}
    for a in range(len(h)):
        if occ[a] == 0 or occ[a] > idx.max_occ:
            continue
        for e in range(lo[a], hi[a]):
            cid = int(idx.contig_ids[e])
            rel = int(qs[a] ^ idx.strands[e])
            t = int(idx.positions[e])
            if rel == 0:
                q = int(qp[a])
            else:
                # on the revcomp read the k-mer starts at rlen - end; under
                # HPC the span exceeds k, so the true end matters
                q = rlen - int(qe[a])
            out.setdefault((cid, rel), []).append((t, q))
    return out


def map_read(
    idx: MinimizerIndex,
    codes: np.ndarray,
    name: str,
    contig_codes: list,
    contig_names: list,
    min_chain_score: float = 40.0,
    min_anchors: int = 3,
) -> list[cio.PafRecord]:
    rlen = len(codes)
    if rlen < idx.k:
        return []
    rc = cseq.revcomp_codes(codes)
    groups = collect_anchors(idx, codes)
    # chain every group
    all_chains = []  # (score, cid, rel, t_arr, q_arr)
    for (cid, rel), pairs in groups.items():
        arr = np.array(sorted(pairs), dtype=np.int64)
        chains = chain_anchors(
            arr[:, 0], arr[:, 1], idx.k,
            min_score=min_chain_score, min_anchors=min_anchors,
        )
        for score, sel in chains:
            all_chains.append((score, cid, rel, arr[sel, 0], arr[sel, 1]))
    all_chains.sort(key=lambda c: -c[0])
    # greedy accept with <50% query overlap; track best competitor per accept
    accepted = []  # (score, f2, cid, rel, t_arr, q_arr)
    for score, cid, rel, t_arr, q_arr in all_chains:
        qs, qe = int(q_arr.min()), int(q_arr.max()) + idx.k
        if rel == 1:
            qs, qe = rlen - qe, rlen - qs
        overlapped = None
        for acc in accepted:
            a_qs, a_qe = acc[6]
            ov = min(qe, a_qe) - max(qs, a_qs)
            if ov > 0.5 * min(qe - qs, a_qe - a_qs):
                overlapped = acc
                break
        if overlapped is None:
            accepted.append([score, 0.0, cid, rel, t_arr, q_arr, (qs, qe)])
        elif score >= 0.25 * overlapped[0]:
            # sub-chain crumbs of the winner score far below it and say
            # nothing about mapping ambiguity; only comparable competitors
            # (true alternative placements) lower MAPQ
            overlapped[1] = max(overlapped[1], score)
    # extend + emit
    records = []
    for score, f2, cid, rel, t_arr, q_arr, (qs0, qe0) in accepted:
        q_codes = codes if rel == 0 else rc
        t_codes = contig_codes[cid]
        # sort anchors along the chain (increasing t, q)
        order = np.argsort(t_arr, kind="stable")
        t_arr, q_arr = t_arr[order], q_arr[order]
        ops, lens, n_match = chain_to_cigar(
            q_codes, t_codes, q_arr, t_arr, idx.k,
            exact_anchors=not idx.hpc,
        )
        q_beg = int(q_arr[0])
        q_end = q_beg + ccigar.query_len(ops, lens)
        t_beg = int(t_arr[0])
        t_end = t_beg + ccigar.target_len(ops, lens)
        n_block = ccigar.n_columns(ops, lens)
        n = len(t_arr)
        mapq = int(
            min(60, 60.0 * (1.0 - f2 / max(score, 1e-9)) * min(1.0, n / 10))
        )
        if rel == 0:
            qs_out, qe_out = q_beg, q_end
        else:
            qs_out, qe_out = rlen - q_end, rlen - q_beg
        records.append(
            cio.PafRecord(
                q_name=name,
                q_len=rlen,
                q_start=qs_out,
                q_end=qe_out,
                strand="-" if rel else "+",
                t_name=contig_names[cid],
                t_len=len(t_codes),
                t_start=t_beg,
                t_end=t_end,
                n_match=n_match,
                n_block=n_block,
                mapq=mapq,
                tags={"tp": "P", "cg": ccigar.to_string(ops, lens)},
            )
        )
    records.sort(key=lambda r: (r.q_start, r.q_end))
    return records


def map_reads(
    contig_fasta: str,
    reads_fasta: str,
    out_paf: str,
    read_type: str = "pacbio",
    min_chain_score: float = 40.0,
) -> int:
    """Map all reads; writes PAF; returns the record count.

    Equivalent of ``minimap2 --secondary=no -c {preset} contigs lr > paf``.
    """
    k, w, hpc = PRESETS[read_type]
    contig_names = []
    contig_codes = []
    for rec in cio.read_fastx(contig_fasta):
        contig_names.append(rec.name)
        contig_codes.append(cseq.encode(rec.seq))
    idx = MinimizerIndex.build(contig_codes, k, w, hpc)
    n = 0
    with open(out_paf, "w") as fp:
        for rec in cio.read_fastx(reads_fasta):
            codes = cseq.encode(rec.seq)
            for pr in map_read(
                idx, codes, rec.name, contig_codes, contig_names,
                min_chain_score=min_chain_score,
            ):
                fp.write(pr.to_line() + "\n")
                n += 1
    return n
