"""Real multi-process bring-up: 2 local processes under
``jax.distributed``, each mapping its host shard of the long-read stream,
PAF shards merged via the assembler's ``--mapping-fofn`` path and checked
against the single-process run.

The reference is single-node; this pins the multi-host contract of
SURVEY.md §2.3 (replicated index, host-sharded reads, shard merge) with
actual separate processes — not a simulated mesh.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)

_WORKER = r"""
import sys

import jax

jax.config.update("jax_platforms", "cpu")

coord, pid, ctg, lr, out_paf = sys.argv[1:6]

sys.path.insert(0, {repo!r})
from haslr_tpu import dist
from haslr_tpu.aligner.map import map_reads

dist.initialize(coord, 2, int(pid))
assert jax.process_count() == 2, jax.process_count()
map_reads(ctg, lr, out_paf, host_shard=dist.host_shard())
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_host_sharded_mapping(tmp_path):
    from haslr_tpu.aligner.map import map_reads
    from haslr_tpu.testutil import simulate

    rng = np.random.default_rng(13)
    genome = simulate.genome_with_repeats(
        rng, 15_000, n_families=2, copies_per_family=3, repeat_len=300
    )
    ctg = str(tmp_path / "ctg.fa")
    with open(ctg, "w") as fp:
        for i in range(0, len(genome) - 1500, 1500):
            fp.write(f">{i // 1500}\n{genome[i:i + 2000]}\n")
    reads = simulate.make_reads(
        rng, genome, coverage=3.0, mean_len=5000, error_rate=0.06
    )
    lr = str(tmp_path / "lr.fa")
    with open(lr, "w") as fp:
        for r in reads:
            fp.write(f">{r.rid}\n{r.seq}\n")

    worker = str(tmp_path / "worker.py")
    with open(worker, "w") as fp:
        fp.write(_WORKER.format(repo=REPO))
    coord = f"127.0.0.1:{_free_port()}"
    shards = [str(tmp_path / f"shard{i}.paf") for i in range(2)]
    procs = [
        subprocess.Popen(
            [sys.executable, worker, coord, str(i), ctg, lr, shards[i]],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        )
        for i in range(2)
    ]
    for p in procs:
        _, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()[-2000:]

    single = str(tmp_path / "single.paf")
    map_reads(ctg, lr, single)
    with open(single) as f:
        want = sorted(f.readlines())
    got = []
    for s in shards:
        with open(s) as f:
            got.extend(f.readlines())
    assert sorted(got) == want and len(want) > 0

    # the assembler consumes the shards through its fofn path: feeding
    # [shard0, shard1] must load exactly the per-read alignments of the
    # single PAF (each read's lines live wholly in one shard)
    from haslr_tpu.assemble.contig_store import ContigStore
    from haslr_tpu.assemble.longread_store import (
        LongreadStore,
        load_alignments,
    )
    from haslr_tpu.config import AssembleConfig

    cfg = AssembleConfig()
    contigs = ContigStore.load_fasta(ctg)
    uniq = contigs.calc_uniq_freq()

    def load(paths):
        lrs = LongreadStore.load_fasta(lr)
        for p in paths:
            load_alignments(p, contigs, lrs, uniq, cfg)
        return [
            [
                tuple(
                    v.tobytes() if isinstance(v, np.ndarray) else v
                    for v in vars(a).values()
                )
                for a in per_read
            ]
            for per_read in lrs.alignments
        ]

    assert load([single]) == load(shards)


def test_initialize_explicit_bad_coordinator_fails():
    """A typo'd coordinator address must fail the process loudly — either
    a Python exception (exit 42 below) or the coordination client's own
    fatal abort — NEVER a silent fallback to single-process mode (exit 7).
    Run in a subprocess so this process's jax stays uninitialized."""
    script = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        f"import sys; sys.path.insert(0, {REPO!r});"
        "from haslr_tpu import dist\n"
        "try:\n"
        "    dist.initialize('definitely-not-a-host:1', 2, 1,"
        " timeout_s=10)\n"
        "except Exception:\n"
        "    sys.exit(42)\n"
        "sys.exit(7)\n"
    )
    p = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, timeout=120
    )
    assert p.returncode not in (0, 7), (
        "bad coordinator address silently degraded to single-process "
        f"mode (rc={p.returncode})"
    )
