"""Phase costs of the PRODUCTION vote-plane kernel (nw_votes_pallas).

Measures, at the bench shape (S=512, W=128, GROUP=64):
  - full kernel (DP + vote traceback)
  - TB_SKIP variant (DP only)  -> traceback = difference
  - DP/TB unroll variants
  - the MXU vote-table reduction

Sync discipline: every timing fetches a SCALAR derived from the real
outputs via jax.device_get (block_until_ready does not reliably block
through the axon relay), and inputs are xor-perturbed per rep so no
result caching can short-circuit execution.
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
    print(f"  {label:44s} {min(ts)*1e3:8.1f} ms  (reps {[f'{t:.2f}' for t in ts]})",
          flush=True)


def main():
    from haslr_tpu.kernels import consensus_dense as cd
    from haslr_tpu.kernels import nw_pallas

    rng = np.random.default_rng(0)
    reads_n = rng.integers(0, 4, (B, S)).astype(np.uint8)
    drafts_n = rng.integers(0, 4, (N, S)).astype(np.uint8)
    r_lens = jnp.asarray(rng.integers(250, 400, B).astype(np.int32))
    d_lens_n = rng.integers(250, 400, N).astype(np.int32)
    win_idx = rng.integers(0, N, B).astype(np.int32)
    jdrafts0 = jnp.asarray(drafts_n)[win_idx]
    jdl = jnp.asarray(d_lens_n)[win_idx]
    wj = jnp.asarray(win_idx)
    ok = jnp.ones(B, bool)
    reads0 = jnp.asarray(reads_n)

    print(f"B={B} S={S} W={W} N={N} reps={REPS}", flush=True)

    def votes(i):
        return nw_pallas.nw_votes_pallas(
            (reads0 + jnp.uint8(i)) & 3, r_lens, jdrafts0, jdl,
            S, S, W, 5, -4, -8,
        )

    timed("votes kernel (DP + vote traceback)", votes)

    nw_pallas.TB_SKIP = True
    nw_pallas.nw_votes_pallas.clear_cache()
    timed("votes kernel TB_SKIP (DP only)", votes)
    nw_pallas.TB_SKIP = False
    nw_pallas.nw_votes_pallas.clear_cache()

    for du, tu in ((2, 1), (4, 1), (1, 2), (2, 2), (4, 4)):
        nw_pallas.DP_UNROLL, nw_pallas.TB_UNROLL = du, tu
        nw_pallas.nw_votes_pallas.clear_cache()
        try:
            timed(f"votes kernel unroll dp={du} tb={tu}", votes)
        except Exception as e:
            print(f"  unroll dp={du} tb={tu}: {e!r}", flush=True)
    nw_pallas.DP_UNROLL = nw_pallas.TB_UNROLL = 1
    nw_pallas.nw_votes_pallas.clear_cache()

    planes, stats = votes(99)

    def vtab(i):
        return cd._kernel_vote_tables(
            planes, stats, wj, ok, N, S
        )

    timed("MXU vote-table reduction", vtab)


if __name__ == "__main__":
    main()
