"""locate_all tail decomposition (v5e, 64M bases).

bench_r3_final: locate_all - locate_first = ~50 ms per 1M queries at
~1 hit/query and capacity ~= batch — the enumerate glue
(cumsum + jnp.repeat machinery + masks), since the backtraced array is
the same size. This times cumulative prefixes of locate_flat_device
after the enumerate rewrite (one repeat + gathers instead of three
repeats):

  E0  ranges (= the count phase, reference point)
  E1  + enumerate_range_positions
  E2  + backtrace_all over the enumerated positions
  E3  + sampled-SA resolve + fold  (= full locate_all)

1M seeded 25-mers, seed k=12, 5 reps, one scalar readback per run.
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
from avxwindowfmindex_tpu.search import (
    _ngram_ranges_steploop,
    _resolve_samples,
    _round_up,
    backtrace_all,
    enumerate_range_positions,
    total_hits_host,
)

NUM_BASES = int(os.environ.get("AWFM_AB_BASES", 64_000_000))
Q = 1 << 20
KMER_LEN = 25
SEED_K = 12
REPS = int(os.environ.get("AWFM_AB_REPS", 5))


def log(m):
    print(f"[locall] {m}", file=sys.stderr, flush=True)


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

    s0, e0 = _ngram_ranges_steploop(
        dev, dig, mat, kmer_len=KMER_LEN, seed_k=SEED_K
    )
    cap = _round_up(total_hits_host(s0, e0), 65536)
    log(f"capacity {cap}")

    def sync1(a):
        return int(np.asarray(a[:1].astype(jnp.uint32)[0]))

    def ranges():
        pend = []
        s, e = _ngram_ranges_steploop(
            dev, dig, mat, kmer_len=KMER_LEN, seed_k=SEED_K, defer=pend
        )
        return s, e, pend

    def fold(x, pend):
        vals = np.asarray(
            jnp.concatenate(
                [x[:1].astype(jnp.uint32)]
                + [p[None].astype(jnp.uint32) for p, _ in pend]
            )
        )
        assert len(vals) == 1 or not vals[1:].any()
        return int(vals[0])

    def e0_fn():
        s, e, pend = ranges()
        return fold(e - s, pend)

    def e1_fn():
        s, e, pend = ranges()
        pos, qid, mask = enumerate_range_positions(s, e, capacity=cap)
        return fold(pos, pend)

    def e2_fn():
        s, e, pend = ranges()
        pos, qid, mask = enumerate_range_positions(s, e, capacity=cap)
        p, off = backtrace_all(dev, pos)
        return fold(p + off, pend)

    def e3_fn():
        s, e, pend = ranges()
        pos, qid, mask = enumerate_range_positions(s, e, capacity=cap)
        p, off = backtrace_all(dev, pos)
        hits = _resolve_samples(dev, p, off)
        return fold(jnp.where(mask, hits, jnp.uint32(0)), pend)

    def e1s_fn():
        os.environ["AWFM_ENUM_SCATTER"] = "1"
        try:
            return e1_fn()
        finally:
            os.environ.pop("AWFM_ENUM_SCATTER", None)

    def e3s_fn():
        os.environ["AWFM_ENUM_SCATTER"] = "1"
        try:
            return e3_fn()
        finally:
            os.environ.pop("AWFM_ENUM_SCATTER", None)

    out = {"exp": "locate_all_decomposition", "batch": Q, "capacity": cap}
    for name, fn in (("E0", e0_fn), ("E1", e1_fn), ("E1s", e1s_fn),
                     ("E2", e2_fn), ("E3", e3_fn), ("E3s", e3s_fn)):
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
