"""Profile the dense consensus engine: where does a bench run's time go?

Breaks the headline workload (1024 windows x 13 reads x ~300 bp, see
bench.py) into phases using consensus_dense.PROF, then times the
individual device pieces (fused NW kernel, vote scatter, vote+compact) in
isolation at the production shape so the optimization target is explicit.
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


def main():
    sys.path.insert(0, "/root/repo")
    import bench
    from haslr_tpu.kernels import consensus_dense as cd
    from haslr_tpu.kernels.consensus import batched_consensus

    windows = bench.make_windows()
    batched_consensus(windows)  # warm/compile
    cd.PROF.clear()
    t0 = time.time()
    batched_consensus(windows)
    total = time.time() - t0
    print(f"total: {total*1e3:.1f} ms  ({len(windows)/total:.1f} win/s)")
    for k, v in sorted(cd.PROF.items()):
        print(f"  {k:24s} {v*1e3:8.1f} ms")

    # isolated pieces at the production shape
    B, S, W = 8192, 512, 128
    N = 1024
    rng = np.random.default_rng(0)
    reads = rng.integers(0, 4, (B, S)).astype(np.uint8)
    drafts = rng.integers(0, 4, (N, S)).astype(np.uint8)
    r_lens = rng.integers(250, 400, B).astype(np.int32)
    d_lens = rng.integers(250, 400, N).astype(np.int32)
    win_idx = rng.integers(0, N, B).astype(np.int32)

    from haslr_tpu.kernels import nw
    from haslr_tpu.kernels.nw_pallas import nw_mapping_pallas

    use_pallas = nw.use_pallas_for(B, S, S, W)
    print(f"use_pallas at (B={B}, S={S}, W={W}): {use_pallas}")

    def timed(label, fn, n=3):
        fn()  # warm
        ts = []
        for _ in range(n):
            t0 = time.time()
            r = fn()
            jax.block_until_ready(r)
            ts.append(time.time() - t0)
        print(f"  {label:32s} {min(ts)*1e3:8.1f} ms")
        return r

    jreads = jnp.asarray(reads)
    jdrafts = jnp.asarray(drafts)[win_idx]
    jrl = jnp.asarray(r_lens)
    jdl = jnp.asarray(d_lens)[win_idx]

    mapping = timed(
        "fused NW pallas (1 round)",
        lambda: nw_mapping_pallas(jreads, jrl, jdrafts, jdl, S, S, W,
                                  5, -4, -8),
    )
    mapping = jnp.asarray(mapping)

    ok = jnp.ones(B, bool)
    wj = jnp.asarray(win_idx)

    scat = jax.jit(lambda m: cd._scatter_votes(m, jreads, jrl, wj, ok, N, S))
    timed("scatter votes (direct)", lambda: scat(mapping))
    scat_s = jax.jit(
        lambda m: cd._scatter_votes_sorted(m, jreads, jrl, wj, ok, N, S)
    )
    timed("scatter votes (sorted)", lambda: scat_s(mapping))

    tables = scat(mapping)
    jd_full = jnp.asarray(
        np.take(drafts, np.arange(N), axis=0)
    )
    vote = jax.jit(
        lambda t: cd._vote_compact(*t, jd_full, jnp.asarray(d_lens), N, S)
    )
    timed("vote + compact", lambda: vote(tables))

    # whole dense round body, single jit (what production runs): 2 rounds
    flat = np.concatenate(
        [rng.integers(0, 4, 400).astype(np.uint8) for _ in range(N + B)]
    )
    print("done")


if __name__ == "__main__":
    main()
