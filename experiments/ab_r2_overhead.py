"""Round-2 A/B #2: where does non-gather time go? One process, interleaved.

The first A/B (ab_r2_config) showed end-to-end digram count is
insensitive to halving the gather count (pair rows) — so ~60%+ of
wall time is NOT the row gather. Candidates: per-dispatch turnaround
through the tunnel, the fixup sync, XLA elementwise work, batch-size
amortization. Each stage isolates one.

Stages:
  0. raw dispatch turnaround: k tiny chained programs + 1 sync
  1. digram count fuse depth 1 vs 3 vs 7 (pair rows on)
  2. digram count with vs without the fixup readback
  3. one 2M-query call vs two 1M-query calls (same work)
  4. single-letter count: XLA rank vs Pallas rank (AWFM_PALLAS_RANK)
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
    print(f"[ab2] {m}", file=sys.stderr, flush=True)


def timeit(fn):
    t0 = time.time()
    fn()
    return time.time() - t0


def interleave(pairs, reps=REPS):
    """pairs: list of (name, fn). Alternate reps rounds; print medians."""
    for _, fn in pairs:
        fn()  # compile/warm
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
    log("index + digram built")

    starts = rng.integers(0, NUM_BASES - KMER_LEN, size=2 * Q)
    windows = np.lib.stride_tricks.sliding_window_view(seq, KMER_LEN)
    mat2 = alpha.NT_ASCII_TO_INDEX[windows[starts]]
    mat = mat2[:Q]

    # ---- stage 0: dispatch turnaround -----------------------------------
    x = jax.block_until_ready(jnp.arange(1024, dtype=jnp.uint32))

    @jax.jit
    def tiny(v):
        return v * jnp.uint32(3) + jnp.uint32(1)

    def chain(k):
        v = x
        for _ in range(k):
            v = tiny(v)
        _ = int(np.asarray(v[0]))

    log("stage 0: dispatch turnaround")
    interleave(
        [
            ("disp1", lambda: chain(1)),
            ("disp8", lambda: chain(8)),
            ("disp32", lambda: chain(32)),
        ]
    )

    # ---- stage 1: fuse depth -------------------------------------------
    def count_fuse(n):
        os.environ["AWFM_FUSE_NGRAM"] = str(n)
        try:
            s, e = S._ngram_ranges_steploop(
                dev, dig, mat, kmer_len=KMER_LEN, seed_k=SEED_K
            )
            c = jnp.where(s <= e, e - s + jnp.uint32(1), jnp.uint32(0))
            _ = int(np.asarray(c[0]))
        finally:
            os.environ.pop("AWFM_FUSE_NGRAM", None)

    log("stage 1: digram fuse depth")
    interleave(
        [
            ("fuse1", lambda: count_fuse(1)),
            ("fuse3", lambda: count_fuse(3)),
            ("fuse7", lambda: count_fuse(7)),
        ]
    )

    # ---- stage 2: fixup sync cost --------------------------------------
    real_fixup = S._fixup_flagged

    def no_fixup(dev_, mat_, lengths_, start, end, bad, classic_fn):
        return start, end

    def count_with_fixup():
        S._fixup_flagged = real_fixup
        count_fuse(1)

    def count_no_fixup():
        S._fixup_flagged = no_fixup
        try:
            count_fuse(1)
        finally:
            S._fixup_flagged = real_fixup

    log("stage 2: fixup readback cost")
    interleave([("fixup", count_with_fixup), ("nofixup", count_no_fixup)])

    # ---- stage 3: batch size -------------------------------------------
    def count_1m_twice():
        for lo in (0, Q):
            s, e = S._ngram_ranges_steploop(
                dev, dig, mat2[lo : lo + Q], kmer_len=KMER_LEN, seed_k=SEED_K
            )
            c = jnp.where(s <= e, e - s + jnp.uint32(1), jnp.uint32(0))
            _ = int(np.asarray(c[0]))

    def count_2m_once():
        s, e = S._ngram_ranges_steploop(
            dev, dig, mat2, kmer_len=KMER_LEN, seed_k=SEED_K
        )
        c = jnp.where(s <= e, e - s + jnp.uint32(1), jnp.uint32(0))
        _ = int(np.asarray(c[0]))

    log("stage 3: 2x1M vs 1x2M")
    interleave([("two_1m", count_1m_twice), ("one_2m", count_2m_once)])

    # ---- stage 4: pallas rank ------------------------------------------
    lengths = np.full(Q, KMER_LEN, dtype=np.int32)

    def count_single(pallas):
        if pallas:
            os.environ["AWFM_PALLAS_RANK"] = "1"
        else:
            os.environ.pop("AWFM_PALLAS_RANK", None)
        try:
            os.environ["AWFM_PAIR_ROWS"] = "0"  # classic path uses occurrence()
            s, e = S._ranges_steploop(dev, mat, lengths, seeded=True)
            c = jnp.where(s <= e, e - s + jnp.uint32(1), jnp.uint32(0))
            _ = int(np.asarray(c[0]))
        finally:
            os.environ.pop("AWFM_PALLAS_RANK", None)
            os.environ["AWFM_PAIR_ROWS"] = "1"

    log("stage 4: single-letter count, xla vs pallas rank")
    interleave(
        [
            ("xla_rank", lambda: count_single(False)),
            ("pallas_rank", lambda: count_single(True)),
        ]
    )

    log("done")


if __name__ == "__main__":
    main()
