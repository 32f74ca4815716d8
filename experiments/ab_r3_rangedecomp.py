"""Where does the digram COUNT phase's time go? (v5e, 64M bases)

After the milestone rewrite, stepdecomp-era math says 6 pair steps +
1 single step should cost ~55 ms per 1M 25-mers (seed k=12), but the
measured count is ~104 ms. This times cumulative prefixes of the
production range pipeline (search._ngram_ranges_steploop internals),
each with the one-scalar-readback sync:

  R0  seed-table lookup (radix index + (B,) gather from the 4^k x 2
      u32 table) + fold
  R1  + the floor(m/2) fused digram pair steps
  R2  + the tail single-letter step(s)
  R3  + validity where + count fold + deferred-fixup fold
      (= the full production run_count)

1M seeded 25-mers, seed k=12 (AWFM_SEED_K to override), 5 reps.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from avxwindowfmindex_tpu import AlphabetType, IndexConfiguration, create_index
from avxwindowfmindex_tpu.models import alphabet as alpha
from avxwindowfmindex_tpu.ops import ngram as ngram_ops
from avxwindowfmindex_tpu import search as S

NUM_BASES = int(os.environ.get("AWFM_AB_BASES", 64_000_000))
Q = 1 << 20
KMER_LEN = 25
SEED_K = int(os.environ.get("AWFM_SEED_K", 12))
REPS = int(os.environ.get("AWFM_AB_REPS", 5))


def log(m):
    print(f"[rangedecomp] {m}", file=sys.stderr, flush=True)


def main():
    if os.environ.get("AWFM_AB_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(1234)
    seq = rng.choice(np.frombuffer(b"acgt", np.uint8), size=NUM_BASES)
    cfg = IndexConfiguration(
        suffix_array_compression_ratio=8,
        kmer_length_in_seed_table=SEED_K,
        alphabet_type=AlphabetType.DNA,
    )
    log("building index")
    index = create_index(seq.tobytes(), cfg)
    dev = index.to_device()
    dig = ngram_ops.build_ngram_device(index, 2)

    starts = rng.integers(0, NUM_BASES - KMER_LEN, size=Q)
    windows = np.lib.stride_tricks.sliding_window_view(seq, KMER_LEN)
    mat = jnp.asarray(
        np.ascontiguousarray(alpha.NT_ASCII_TO_INDEX[windows[starts]])
    )
    jax.block_until_ready(mat)

    n = dig.n
    m = KMER_LEN - SEED_K
    fuse = S._fuse_ngram()
    groups = [[m - n * (t + 1) + j for j in range(n)] for t in range(m // n)]
    tail = list(range(m % n - 1, -1, -1))

    def sync1(a):
        return int(np.asarray(a[:1].astype(jnp.uint32)[0]))

    def seed():
        return S._seed_lookup(dev, mat[:, KMER_LEN - SEED_K : KMER_LEN])

    def digram_steps(start, end, bad):
        for lo in range(0, len(groups), fuse):
            seg = groups[lo : lo + fuse]
            cols = [c for g in seg for c in g]
            start, end, bad = S._ngram_steps_fused_pair(
                dig, start, end, bad, *[mat[:, c] for c in cols],
                seg=len(seg),
            )
        return start, end, bad

    def tail_steps(start, end, bad):
        for lo in range(0, len(tail), fuse):
            seg = tail[lo : lo + fuse]
            start, end, bad = S._steps_fused_pair(
                dev, start, end, bad, *[mat[:, c] for c in seg],
                seg=len(seg),
            )
        return start, end, bad

    def r0():
        s, e = seed()
        return sync1(e - s)

    def r1():
        s, e = seed()
        bad = jnp.zeros(Q, dtype=bool)
        s, e, bad = digram_steps(s, e, bad)
        return sync1(e - s)

    def r2():
        s, e = seed()
        bad = jnp.zeros(Q, dtype=bool)
        s, e, bad = digram_steps(s, e, bad)
        s, e, bad = tail_steps(s, e, bad)
        return sync1(e - s)

    def r3():  # the full production count
        pend = []
        s, e = S._ngram_ranges_steploop(
            dev, dig, mat, kmer_len=KMER_LEN, seed_k=SEED_K, defer=pend
        )
        c = jnp.where(s <= e, e - s + jnp.uint32(1), jnp.uint32(0))
        vals = np.asarray(
            jnp.concatenate(
                [c[:1]] + [p[None].astype(jnp.uint32) for p, _ in pend]
            )
        )
        return int(vals[0])

    out = {"exp": "range_decomposition", "batch": Q, "seed_k": SEED_K}
    for name, fn in (("R0", r0), ("R1", r1), ("R2", r2), ("R3", r3)):
        fn()
        times = []
        for _ in range(REPS):
            t0 = time.time()
            fn()
            times.append(time.time() - t0)
        out[name] = round(float(np.median(times)), 4)
        log(f"{name}: {out[name]} s")
    print(json.dumps(out), flush=True)
    log("done")


if __name__ == "__main__":
    main()
