"""Split the consensus device time into its true phase costs.

prof_consensus.py times single dispatches, which fold ~25-45 ms of
remote-relay launch latency into every number.  Here each phase runs
``REPS`` async dispatches back-to-back with one block at the end, so the
per-dispatch wall cost converges to the device execution time.

Phases at the production shape (S=512, W=128, B=8192, N=1024):
  - fused NW pallas (DP + in-kernel traceback)
  - fused NW pallas with TB_SKIP (DP only) -> traceback = difference
  - nw_dirs_pallas (DP streaming dirs to HBM)
  - scatter votes: direct / sorted / packed
  - vote + compact
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

REPS = 10


def timed(label, fn):
    fn()  # warm/compile
    t0 = time.time()
    outs = [fn() for _ in range(REPS)]
    jax.block_until_ready(outs)
    dt = (time.time() - t0) / REPS
    print(f"  {label:40s} {dt * 1e3:8.1f} ms")
    return outs[0]


def main():
    from haslr_tpu.kernels import consensus_dense as cd
    from haslr_tpu.kernels import nw
    from haslr_tpu.kernels import nw_pallas

    B, S, W = 8192, 512, 128
    N = 1024
    rng = np.random.default_rng(0)
    reads = jnp.asarray(rng.integers(0, 4, (B, S)).astype(np.uint8))
    drafts_n = rng.integers(0, 4, (N, S)).astype(np.uint8)
    r_lens = jnp.asarray(rng.integers(250, 400, B).astype(np.int32))
    d_lens_n = rng.integers(250, 400, N).astype(np.int32)
    win_idx = rng.integers(0, N, B).astype(np.int32)
    jdrafts = jnp.asarray(drafts_n)[win_idx]
    jdl = jnp.asarray(d_lens_n)[win_idx]
    wj = jnp.asarray(win_idx)
    ok = jnp.ones(B, bool)

    print(f"B={B} S={S} W={W} N={N} reps={REPS}")

    mapping = timed(
        "fused NW (DP + in-kernel traceback)",
        lambda: nw_pallas.nw_mapping_pallas(
            reads, r_lens, jdrafts, jdl, S, S, W, 5, -4, -8
        ),
    )
    nw_pallas.TB_SKIP = True
    nw_pallas.nw_mapping_pallas.clear_cache()
    timed(
        "fused NW with TB_SKIP (DP only)",
        lambda: nw_pallas.nw_mapping_pallas(
            reads, r_lens, jdrafts, jdl, S, S, W, 5, -4, -8
        ),
    )
    nw_pallas.TB_SKIP = False
    nw_pallas.nw_mapping_pallas.clear_cache()

    for du, tu in ((2, 2),):
        nw_pallas.DP_UNROLL, nw_pallas.TB_UNROLL = du, tu
        nw_pallas.nw_mapping_pallas.clear_cache()
        try:
            timed(
                f"fused NW unroll dp={du} tb={tu}",
                lambda: nw_pallas.nw_mapping_pallas(
                    reads, r_lens, jdrafts, jdl, S, S, W, 5, -4, -8
                ),
            )
        except Exception as e:
            print(f"  fused NW unroll dp={du} tb={tu}: {e!r}")
    nw_pallas.DP_UNROLL = nw_pallas.TB_UNROLL = 1
    nw_pallas.nw_mapping_pallas.clear_cache()

    mapping = jnp.asarray(mapping)
    for name in ("scatter", "packed"):
        fn = cd._SCATTER_IMPLS[name]
        scat = jax.jit(
            lambda m, fn=fn: fn(m, reads, r_lens, wj, ok, N, S)
        )
        timed(f"scatter votes ({name})", lambda: scat(mapping))


if __name__ == "__main__":
    main()
