"""Decompose the backtrace schedule: where do 0.32-0.36 s / 1M hits go?

Measured parts (each ends in a scalar readback; subtract `sync`):
  sync        — no-op dependent readback (dispatch+sync floor)
  fused8      — 8 fused single-LF steps, 1M rows
  pair4       — 4 fused pair-LF steps (8 LF), 1M rows (optimized kernel)
  nonzero450k — _gather_undone m=450K over 1M
  scatter450k — _scatter_back of the compacted rows
  resolve     — _resolve_samples over 1M
Then schedule variants single vs pair (tuned + straight) and the e2e
locate_all headline.
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
from avxwindowfmindex_tpu.ops import bt_digram, ngram as ngram_ops
from avxwindowfmindex_tpu import search as S

NUM_BASES = 64_000_000
Q = 1 << 20
KMER_LEN = 25
SEED_K = 12
REPS = 4


def log(m):
    print(f"[btsched] {m}", file=sys.stderr, flush=True)


def interleave(pairs, reps=REPS):
    for _, fn in pairs:
        fn()
    times = {name: [] for name, _ in pairs}
    for _ in range(reps):
        for name, fn in pairs:
            t0 = time.time()
            fn()
            times[name].append(time.time() - t0)
    out = {"exp": "_vs_".join(n for n, _ in pairs)}
    for name, _ in pairs:
        out[name] = round(float(np.median(times[name])), 4)
        out[f"{name}_times"] = [round(t, 4) for t in times[name]]
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
    bt = bt_digram.build_backtrace_digram_device(index)

    starts = rng.integers(0, NUM_BASES - KMER_LEN, size=Q)
    windows = np.lib.stride_tricks.sliding_window_view(seq, KMER_LEN)
    mat = jax.block_until_ready(
        jnp.asarray(alpha.NT_ASCII_TO_INDEX[windows[starts]])
    )
    s0, e0 = S._ngram_ranges_steploop(
        dev, dig, mat, kmer_len=KMER_LEN, seed_k=SEED_K
    )
    pos0 = jax.block_until_ready(jnp.where(s0 <= e0, s0, jnp.uint32(0)))
    zeros = jnp.zeros_like(pos0)
    log("positions ready")

    # correctness of the rewritten pair kernel
    ref_p, ref_off = S.backtrace_all(dev, pos0)
    p1, off1 = S.backtrace_all(dev, pos0, bt)
    same = int(np.asarray(jnp.sum(((ref_p == p1) & (ref_off == off1)).astype(jnp.int32))))
    assert same == Q, same
    log("pair walk identical")

    def sync(x):
        _ = int(np.asarray(x[0]))

    m450 = S._round_up(450_000, 256)
    idx0, sp0, so0 = S._gather_undone(dev, ref_p, ref_off, m=m450)

    interleave(
        [
            ("sync", lambda: sync(pos0)),
            ("fused8", lambda: sync(
                S._backtrace_steps_fused(dev, pos0, zeros, seg=8)[0])),
            ("pair4", lambda: sync(
                S._backtrace_pair_steps_fused(bt, pos0, zeros, ratio=8, seg=4)[0])),
            ("nonzero450k", lambda: sync(
                S._gather_undone(dev, ref_p, ref_off, m=m450)[1])),
            ("scatter450k", lambda: sync(
                S._scatter_back(ref_p, ref_off, idx0, sp0, so0)[0])),
            ("resolve", lambda: sync(S._resolve_samples(dev, ref_p, ref_off))),
        ]
    )

    # straight pair pass: N fused pair dispatches, one synced tail
    def straight_pair(n_pair, fuse=4):
        p, off = pos0, zeros
        done = 0
        while done < n_pair:
            seg = min(fuse, n_pair - done)
            p, off = S._backtrace_pair_steps_fused(bt, p, off, ratio=8, seg=seg)
            done += seg
        # synced exact tail
        while True:
            cnt = int(np.asarray(S._undone_count(dev, p)))
            if cnt == 0:
                break
            m = S._round_up_pow2(cnt, floor=256)
            if m >= p.shape[0]:
                p, off = S._backtrace_pair_steps_fused(bt, p, off, ratio=8, seg=8)
                continue
            idx, sub_p, sub_off = S._gather_undone(dev, p, off, m=m)
            sub_p, sub_off = S._backtrace_pair_steps_fused(
                bt, sub_p, sub_off, ratio=8, seg=8)
            p, off = S._scatter_back(p, off, idx, sub_p, sub_off)
        return p, off

    def run_sched(fn):
        p, off = fn()
        sync(S._resolve_samples(dev, p, off))

    interleave(
        [
            ("tuned_single", lambda: run_sched(
                lambda: S.backtrace_all(dev, pos0))),
            ("tuned_pair", lambda: run_sched(
                lambda: S.backtrace_all(dev, pos0, bt))),
            ("straight8p", lambda: run_sched(lambda: straight_pair(8))),
            ("straight12p", lambda: run_sched(lambda: straight_pair(12))),
            ("straight16p", lambda: run_sched(lambda: straight_pair(16, 8))),
        ]
    )

    cap = S._round_up(S.total_hits_host(s0, e0), 65536)

    def run_e2e(b, single_ranges=False):
        if single_ranges:
            lens = np.full(Q, KMER_LEN, dtype=np.int32)
            s, e = S._ranges_steploop(dev, mat, lens, seeded=True)
        else:
            s, e = S._ngram_ranges_steploop(
                dev, dig, mat, kmer_len=KMER_LEN, seed_k=SEED_K
            )
        hits, _qid, _mask = S.locate_flat_device(dev, s, e, capacity=cap, bt=b)
        sync(hits)

    interleave(
        [
            ("e2e_single", lambda: run_e2e(None)),
            ("e2e_pair", lambda: run_e2e(bt)),
            ("e2e_pair_1stepranges", lambda: run_e2e(bt, single_ranges=True)),
        ]
    )
    log("done")


if __name__ == "__main__":
    main()
