"""A/B: pair-LF backtrace (ops/bt_digram.py) vs the single-LF walk.

One 384 B row gather now advances TWO LF steps (checking the
intermediate position's sampledness), so the tuned schedule's gather
count halves. Variants over real post-seed positions (1M range starts,
ratio 8, 64M-base index):

  single   — production single-LF backtrace_all
  pair     — backtrace_all with the BacktraceDigramIndex
  fuse sweep — pair steps fused per dispatch (2/4/8)
  e2e      — full locate_all (digram ranges + enumerate + backtrace +
             resolve), the bench headline, both ways
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
    print(f"[btpair] {m}", file=sys.stderr, flush=True)


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
    t0 = time.time()
    bt = bt_digram.build_backtrace_digram_device(index)
    log(f"bt table built in {time.time() - t0:.1f}s")

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

    # answers must agree
    ref_p, ref_off = S.backtrace_all(dev, pos0)
    p1, off1 = S.backtrace_all(dev, pos0, bt)
    same_p = int(np.asarray(jnp.sum((ref_p == p1).astype(jnp.int32))))
    same_o = int(np.asarray(jnp.sum((ref_off == off1).astype(jnp.int32))))
    assert same_p == Q and same_o == Q, (same_p, same_o)
    log("pair walk identical to single walk")

    def run_bt(b):
        p, off = S.backtrace_all(dev, pos0, b)
        hits = S._resolve_samples(dev, p, off)
        _ = int(np.asarray(hits[0]))

    interleave(
        [
            ("single", lambda: run_bt(None)),
            ("pair", lambda: run_bt(bt)),
        ]
    )

    def fuse(n):
        os.environ["AWFM_FUSE_BACKTRACE_PAIR"] = str(n)
        run_bt(bt)

    interleave(
        [
            ("pfuse2", lambda: fuse(2)),
            ("pfuse4", lambda: fuse(4)),
            ("pfuse8", lambda: fuse(8)),
        ]
    )
    os.environ.pop("AWFM_FUSE_BACKTRACE_PAIR", None)

    cap = S._round_up(
        S.total_hits_host(s0, e0), 65536
    )
    log(f"locate_all capacity {cap}")

    def run_e2e(b):
        s, e = S._ngram_ranges_steploop(
            dev, dig, mat, kmer_len=KMER_LEN, seed_k=SEED_K
        )
        hits, _qid, _mask = S.locate_flat_device(dev, s, e, capacity=cap, bt=b)
        _ = int(np.asarray(hits[0]))

    interleave(
        [
            ("e2e_single", lambda: run_e2e(None)),
            ("e2e_pair", lambda: run_e2e(bt)),
        ]
    )
    log("done")


if __name__ == "__main__":
    main()
