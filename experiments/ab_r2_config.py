"""Round-2 A/B: pair rows, backtrace schedule, fusion — one process.

Interleaved trials (A B A B ...) inside a single process on the real
TPU, so tunnel drift between runs cannot masquerade as a config effect
(round-1 lesson: day-to-day tunnel variance is +-50%, in-process
interleaved variance is a few %).

Stages:
  1. digram count: pair rows ON vs OFF
  2. locate first-hit: fixed-schedule backtrace vs synced-tail-only
     (round-1 behavior)
  3. pure backtrace of 1M uniform positions: same two variants
  4. backtrace fuse depth 4 vs 8 (fixed schedule)

Prints one JSON line per comparison. Run detached (CLAUDE.md rules).
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

NUM_BASES = 64_000_000
Q = 1 << 20
KMER_LEN = 25
SEED_K = 12
REPS = 4


def log(m):
    print(f"[ab] {m}", file=sys.stderr, flush=True)


def timeit(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def interleave(name_a, fn_a, name_b, fn_b, reps=REPS):
    """Alternate timed runs; report per-variant medians + ratio."""
    fn_a()  # compile/warm both
    fn_b()
    ta, tb = [], []
    for _ in range(reps):
        ta.append(timeit(fn_a))
        tb.append(timeit(fn_b))
    med_a, med_b = float(np.median(ta)), float(np.median(tb))
    out = {
        "exp": f"{name_a}_vs_{name_b}",
        name_a: round(med_a, 4),
        name_b: round(med_b, 4),
        f"{name_a}_times": [round(t, 4) for t in ta],
        f"{name_b}_times": [round(t, 4) for t in tb],
        "ratio_b_over_a": round(med_b / med_a, 3),
    }
    print(json.dumps(out), flush=True)


def main():
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
    log("index + digram built")

    starts = rng.integers(0, NUM_BASES - KMER_LEN, size=Q)
    windows = np.lib.stride_tricks.sliding_window_view(seq, KMER_LEN)
    mat = alpha.NT_ASCII_TO_INDEX[windows[starts]]

    def count_digram():
        s, e = S._ngram_ranges_steploop(
            dev, dig, mat, kmer_len=KMER_LEN, seed_k=SEED_K
        )
        c = jnp.where(s <= e, e - s + jnp.uint32(1), jnp.uint32(0))
        _ = int(np.asarray(c[0]))

    def pair_on():
        os.environ["AWFM_PAIR_ROWS"] = "1"
        count_digram()

    def pair_off():
        os.environ["AWFM_PAIR_ROWS"] = "0"
        count_digram()

    log("stage 1: digram count pair on/off")
    interleave("pair_on", pair_on, "pair_off", pair_off)
    os.environ["AWFM_PAIR_ROWS"] = "1"

    # ---- backtrace variants --------------------------------------------
    def backtrace_synced_tail(positions):
        """Round-1 driver: fixed 16-step pass + synced compaction loop."""
        n_steps = min(64, max(4, 2 * dev.ratio))
        zeros = jnp.zeros_like(positions)
        p, off = S._backtrace_steps_any(dev, positions, zeros, n_steps)
        while True:
            cnt = int(np.asarray(S._undone_count(dev, p)))
            if cnt == 0:
                return p, off
            m = S._round_up_pow2(cnt, floor=256)
            if m >= p.shape[0]:
                p, off = S._backtrace_steps_any(dev, p, off, n_steps)
                continue
            idx, sub_p, sub_off = S._gather_undone(dev, p, off, m=m)
            sub_p, sub_off = S._backtrace_steps_any(dev, sub_p, sub_off, n_steps)
            p, off = S._scatter_back(p, off, idx, sub_p, sub_off)

    # precompute ranges once; time backtrace+resolve only
    s0, e0 = S._ngram_ranges_steploop(
        dev, dig, mat, kmer_len=KMER_LEN, seed_k=SEED_K
    )
    valid = s0 <= e0
    pos0 = jnp.where(valid, s0, jnp.uint32(0))
    pos0 = jax.block_until_ready(pos0)

    def bt_fixed():
        p, off = S.backtrace_all(dev, pos0)
        hits = S._resolve_samples(dev, p, off)
        _ = int(np.asarray(hits[0]))

    def bt_synced():
        p, off = backtrace_synced_tail(pos0)
        hits = S._resolve_samples(dev, p, off)
        _ = int(np.asarray(hits[0]))

    log("stage 2: backtrace fixed-schedule vs synced-tail")
    interleave("bt_fixed", bt_fixed, "bt_synced", bt_synced)

    def bt_fixed_f8():
        os.environ["AWFM_FUSE_BACKTRACE"] = "8"
        try:
            bt_fixed()
        finally:
            os.environ.pop("AWFM_FUSE_BACKTRACE", None)

    log("stage 3: backtrace fuse 4 vs 8")
    interleave("bt_fuse4", bt_fixed, "bt_fuse8", bt_fixed_f8)

    # ---- end-to-end locate first hit -----------------------------------
    def locate_fixed():
        s, e = S._ngram_ranges_steploop(
            dev, dig, mat, kmer_len=KMER_LEN, seed_k=SEED_K
        )
        pos = jnp.where(s <= e, s, jnp.uint32(0))
        p, off = S.backtrace_all(dev, pos)
        hits = S._resolve_samples(dev, p, off)
        _ = int(np.asarray(hits[0]))

    def locate_synced():
        s, e = S._ngram_ranges_steploop(
            dev, dig, mat, kmer_len=KMER_LEN, seed_k=SEED_K
        )
        pos = jnp.where(s <= e, s, jnp.uint32(0))
        p, off = backtrace_synced_tail(pos)
        hits = S._resolve_samples(dev, p, off)
        _ = int(np.asarray(hits[0]))

    log("stage 4: end-to-end locate, fixed vs synced backtrace")
    interleave("loc_fixed", locate_fixed, "loc_synced", locate_synced)

    log("done")


if __name__ == "__main__":
    main()
