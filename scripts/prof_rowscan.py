"""On-chip validation + phase costs of the row-scan engine.

1. Bit-equality on hardware: rowscan Pallas mapping == rowscan XLA
   mapping; rowscan votes kernel tables == mapping + scatter tables;
   CIGAR-run kernel == XLA run emission.
2. Timing at the bench shape (S=512, W=128): rowscan votes kernel vs the
   wavefront votes kernel, DP-only variants, and the CIGAR kernel.

Sync discipline: every timing fetches a SCALAR derived from real outputs
via jax.device_get (block_until_ready does not reliably block through
the axon relay), and inputs are xor-perturbed per rep so result caching
cannot short-circuit execution.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

B, S, W = 8192, 512, 128
N = 1024
REPS = 3


def sync(x):
    return np.asarray(jax.device_get(x))


def timed(label, fn):
    fn(0)  # compile + first-call program overhead
    ts = []
    for i in range(REPS):
        t0 = time.time()
        out = fn(i + 1)
        s = jax.tree.leaves(out)[0]
        _ = sync(s.reshape(-1)[0])
        ts.append(time.time() - t0)
    print(f"  {label:44s} {min(ts)*1e3:8.1f} ms  "
          f"(reps {[f'{t:.2f}' for t in ts]})", flush=True)


def check_equalities():
    from haslr_tpu.kernels import consensus_dense as cd
    from haslr_tpu.kernels import nw
    from haslr_tpu.kernels import nw_rowscan as rs

    rng = np.random.default_rng(7)
    Bc, Sc = 128, 512
    reads = rng.integers(0, 4, (Bc, Sc)).astype(np.uint8)
    drafts = reads.copy()
    for b in range(Bc):
        for _ in range(25):
            p = int(rng.integers(0, Sc - 1))
            drafts[b, p] = rng.integers(0, 4)
    r_lens = rng.integers(200, 400, Bc).astype(np.int32)
    d_lens = (r_lens + rng.integers(-30, 31, Bc)).astype(np.int32)
    args = (
        jnp.asarray(reads), jnp.asarray(r_lens),
        jnp.asarray(drafts), jnp.asarray(d_lens),
        Sc, Sc, W, 5, -4, -8,
    )
    m_p = np.asarray(nw._align_mapping(*args, True, "rowscan"))
    m_x = np.asarray(nw._align_mapping(*args, False, "rowscan"))
    ok_map = np.array_equal(m_p, m_x)
    print(f"mapping pallas == xla: {ok_map}", flush=True)

    Nw = 16
    win_idx = jnp.asarray(rng.integers(0, Nw, Bc).astype(np.int32))
    okv = jnp.asarray(np.abs(r_lens - d_lens) < W // 2 - 4)
    ref = cd._scatter_votes(
        jnp.asarray(m_x), args[0], args[1], win_idx, okv, Nw, Sc,
    )
    planes, stats = rs.rowscan_votes_pallas(*args)
    got = cd._kernel_vote_tables(planes, stats, win_idx, okv, Nw, Sc)
    ok_votes = all(
        np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(ref, got)
    )
    print(f"votes tables pallas == scatter: {ok_votes}", flush=True)

    MAXR = 128
    rx, nx = rs._rowscan_cigar_inner(*args[:4], Sc, Sc, W, 2, -4, -2, MAXR)
    rp, cp = rs.rowscan_cigar_pallas(*args[:4], Sc, Sc, W, 2, -4, -2, MAXR)
    nx = np.asarray(nx)
    ok_cnt = np.array_equal(nx, np.asarray(cp)[:, 0])
    lanem = np.arange(MAXR)[None, :] < np.minimum(nx, MAXR)[:, None]
    ok_runs = np.array_equal(np.asarray(rx)[lanem], np.asarray(rp)[lanem])
    print(f"cigar runs pallas == xla: {ok_cnt and ok_runs}", flush=True)
    return ok_map and ok_votes and ok_cnt and ok_runs


def main():
    from haslr_tpu.kernels import nw_pallas
    from haslr_tpu.kernels import nw_rowscan as rs

    print("=== on-chip equality ===", flush=True)
    ok = check_equalities()
    if not ok:
        print("EQUALITY FAILED — do not ship", flush=True)

    rng = np.random.default_rng(0)
    reads_n = rng.integers(0, 4, (B, S)).astype(np.uint8)
    drafts_n = rng.integers(0, 4, (N, S)).astype(np.uint8)
    r_lens = jnp.asarray(rng.integers(250, 400, B).astype(np.int32))
    d_lens_n = rng.integers(250, 400, N).astype(np.int32)
    win_idx = rng.integers(0, N, B).astype(np.int32)
    jdrafts0 = jnp.asarray(drafts_n)[win_idx]
    jdl = jnp.asarray(d_lens_n)[win_idx]
    reads0 = jnp.asarray(reads_n)

    print(f"=== timing: B={B} S={S} W={W} reps={REPS} ===", flush=True)

    def rs_votes(i):
        return rs.rowscan_votes_pallas(
            (reads0 + jnp.uint8(i)) & 3, r_lens, jdrafts0, jdl,
            S, S, W, 5, -4, -8,
        )

    def wf_votes(i):
        return nw_pallas.nw_votes_pallas(
            (reads0 + jnp.uint8(i)) & 3, r_lens, jdrafts0, jdl,
            S, S, W, 5, -4, -8,
        )

    def rs_mapping(i):
        return rs.rowscan_mapping_pallas(
            (reads0 + jnp.uint8(i)) & 3, r_lens, jdrafts0, jdl,
            S, S, W, 5, -4, -8,
        )

    def rs_cigar(i):
        return rs.rowscan_cigar_pallas(
            (reads0 + jnp.uint8(i)) & 3, r_lens, jdrafts0, jdl,
            S, S, W, 2, -4, -2, 128,
        )

    timed("rowscan votes kernel (DP + traceback)", rs_votes)
    timed("wavefront votes kernel (DP + traceback)", wf_votes)
    timed("rowscan mapping kernel", rs_mapping)
    timed("rowscan cigar kernel (MAXR=128)", rs_cigar)


if __name__ == "__main__":
    main()
