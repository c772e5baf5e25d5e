"""Micro-benchmark of the fused NW Pallas kernel at the production shape.

Times nw_mapping_pallas alone (no consensus machinery) so kernel-level
changes can be measured with exactly one remote compile per variant.

Usage: python scripts/bench_kernel.py [B] [S] [W]
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
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    W = int(sys.argv[3]) if len(sys.argv) > 3 else 128

    from haslr_tpu.kernels.nw_pallas import nw_mapping_pallas

    rng = np.random.default_rng(0)
    reads = rng.integers(0, 4, (B, S)).astype(np.uint8)
    drafts = rng.integers(0, 4, (B, S)).astype(np.uint8)
    r_lens = rng.integers(250, 400, B).astype(np.int32)
    d_lens = (r_lens + rng.integers(-40, 41, B)).astype(np.int32)
    jr, jd = jnp.asarray(reads), jnp.asarray(drafts)
    jrl, jdl = jnp.asarray(r_lens), jnp.asarray(d_lens)

    # sum on device so the D2H fetch is 8 bytes: through the axon relay
    # block_until_ready returns before remote execution completes and a
    # full-tensor np.asarray would time the ~40 MB/s relay, not the kernel
    @jax.jit
    def run():
        m = nw_mapping_pallas(jr, jrl, jd, jdl, S, S, W, 5, -4, -8)
        return jnp.sum(m.astype(jnp.int64))

    t0 = time.time()
    out = np.asarray(run())
    print(f"compile+first: {time.time()-t0:.1f} s", flush=True)

    ts = []
    for _ in range(5):
        t0 = time.time()
        out = np.asarray(run())
        ts.append(time.time() - t0)
    best = min(ts)
    cells = float(B) * (r_lens + d_lens).mean() * W
    print(
        f"fused NW (B={B}, S={S}, W={W}): {best*1e3:.1f} ms "
        f"({B/best:.0f} aligns/s, {cells/best/1e9:.1f} Gcell/s)",
        flush=True,
    )
    print("checksum:", int(out))


if __name__ == "__main__":
    main()
