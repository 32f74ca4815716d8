"""A/B: backtrace_all schedules, now that LF steps are cheap.

lf_u8 in ab_r2_u32rank measured 8 fused LF steps over 1M rows at
~55 ms (≈147M row-visits/s), yet end-to-end locate attributes ~0.38 s
to backtrace+resolve — the schedule (compaction rounds, syncs, wasted
visits) dominates, not the gathers. Variants over real post-seed
positions (1M range starts):

  fixed      — current production fixed 5/8-shrink schedule
  synced16   — 16-step pass + exact synced compaction loop (round 1)
  tuned      — 6-step segments, sync-free halving schedule, synced tail
  straight32 — 32 fused steps, no compaction, then synced tail
"""

import json
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
    print(f"[bt] {m}", file=sys.stderr, flush=True)


def timeit(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def interleave(pairs, reps=REPS):
    for _, fn in pairs:
        fn()
    times = {name: [] for name, _ in pairs}
    for _ in range(reps):
        for name, fn in pairs:
            times[name].append(timeit(fn))
    out = {"exp": "_vs_".join(n for n, _ in pairs)}
    for name, _ in pairs:
        out[name] = round(float(np.median(times[name])), 4)
        out[f"{name}_times"] = [round(t, 4) for t in times[name]]
    print(json.dumps(out), flush=True)


def synced_tail(dev, p, off, n_steps):
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


def bt_fixed(dev, pos):
    return S.backtrace_all(dev, pos)


def bt_synced16(dev, pos):
    zeros = jnp.zeros_like(pos)
    p, off = S._backtrace_steps_any(dev, pos, zeros, 16)
    return synced_tail(dev, p, off, 16)


def bt_tuned(dev, pos, first=6, seg=6, num=1, den=2):
    b = pos.shape[0]
    zeros = jnp.zeros_like(pos)
    p, off = S._backtrace_steps_any(dev, pos, zeros, first)
    m = (b * 45) // 100  # undone after 6 steps ~ (7/8)^6 = 0.449
    while m >= 4096:
        m = S._round_up(m, 256)
        idx, sub_p, sub_off = S._gather_undone(dev, p, off, m=m)
        sub_p, sub_off = S._backtrace_steps_any(dev, sub_p, sub_off, seg)
        p, off = S._scatter_back(p, off, idx, sub_p, sub_off)
        m = (m * num) // den
    return synced_tail(dev, p, off, 16)


def bt_straight32(dev, pos):
    zeros = jnp.zeros_like(pos)
    p, off = S._backtrace_steps_any(dev, pos, zeros, 32)
    return synced_tail(dev, p, off, 16)


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

    starts = rng.integers(0, NUM_BASES - KMER_LEN, size=Q)
    windows = np.lib.stride_tricks.sliding_window_view(seq, KMER_LEN)
    mat = jax.block_until_ready(
        jnp.asarray(alpha.NT_ASCII_TO_INDEX[windows[starts]])
    )
    s0, e0 = S._ngram_ranges_steploop(
        dev, dig, mat, kmer_len=KMER_LEN, seed_k=SEED_K
    )
    pos0 = jax.block_until_ready(jnp.where(s0 <= e0, s0, jnp.uint32(0)))
    log("positions ready")

    # answers must agree across variants
    ref_p, ref_off = bt_fixed(dev, pos0)
    ref_hits = np.asarray(S._resolve_samples(dev, ref_p, ref_off))
    for name, fn in (
        ("synced16", bt_synced16),
        ("tuned", bt_tuned),
        ("straight32", bt_straight32),
    ):
        p, off = fn(dev, pos0)
        hits = np.asarray(S._resolve_samples(dev, p, off))
        assert (hits == ref_hits).all(), name
    log("all variants agree")

    def run(fn):
        p, off = fn(dev, pos0)
        hits = S._resolve_samples(dev, p, off)
        _ = int(np.asarray(hits[0]))

    interleave(
        [
            ("fixed", lambda: run(bt_fixed)),
            ("synced16", lambda: run(bt_synced16)),
            ("tuned", lambda: run(bt_tuned)),
            ("straight32", lambda: run(bt_straight32)),
        ]
    )

    # seg sweep for the tuned variant
    interleave(
        [
            ("tuned6", lambda: run(lambda d, p: bt_tuned(d, p, 6, 6))),
            ("tuned8", lambda: run(lambda d, p: bt_tuned(d, p, 8, 8, 1, 3))),
            ("tuned4", lambda: run(lambda d, p: bt_tuned(d, p, 4, 4, 5, 8))),
        ]
    )
    log("done")


if __name__ == "__main__":
    main()
