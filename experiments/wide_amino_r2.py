"""Amino wide layout: 512 B pair rows vs 384 B compact rows (v5e).

Nucleotide pair fusion is free (fills padding); amino pays +128 B/block
for halved seeded-step gathers. This measures whether the default
(pair_fused=True) is right for amino or whether AWFM_PAIR_ROWS=0
(compact) should be recommended at capacity scale.

Runs both layouts on a 64M-letter amino index, 1M seeded 20-mers.
Timing syncs on a scalar readback; protocol-matched host matrices.
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
from avxwindowfmindex_tpu import search64 as S64

NUM_LETTERS = int(os.environ.get("AWFM_WIDE_AA_LETTERS", 64_000_000))
Q = 1 << 20
KMER_LEN = 20
SEED_K = 5
REPS = int(os.environ.get("AWFM_WIDE_AA_REPS", 4))

AA_LETTERS = b"acdefghiklmnpqrstvwy"


def log(m):
    print(f"[wideaa] {m}", file=sys.stderr, flush=True)


def sync(a):
    return int(np.asarray(jnp.sum(a[:1].astype(jnp.uint32))))


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
    seq = rng.choice(np.frombuffer(AA_LETTERS, np.uint8), size=NUM_LETTERS)
    cfg = IndexConfiguration(
        suffix_array_compression_ratio=8,
        kmer_length_in_seed_table=SEED_K,
        alphabet_type=AlphabetType.AMINO,
    )
    log("building amino index")
    t0 = time.time()
    index = create_index(seq.tobytes(), cfg)
    log(f"built in {time.time() - t0:.0f}s")

    os.environ["AWFM_PAIR_ROWS"] = "1"
    dev_pair = index.to_device(refresh=True, wide=True)
    assert dev_pair.pair_fused and dev_pair.row_bytes == 512
    os.environ["AWFM_PAIR_ROWS"] = "0"
    dev_compact = index.to_device(refresh=True, wide=True)
    assert not dev_compact.pair_fused and dev_compact.row_bytes == 384
    os.environ["AWFM_PAIR_ROWS"] = "1"

    starts = rng.integers(0, NUM_LETTERS - KMER_LEN, size=Q)
    windows = np.lib.stride_tricks.sliding_window_view(seq, KMER_LEN)
    mat = np.ascontiguousarray(alpha.AA_ASCII_TO_INDEX[windows[starts]])
    lens = np.full(Q, KMER_LEN, dtype=np.int32)

    # answers must agree across layouts
    ph = S64._ranges_steploop64(dev_pair, mat, lens, True, pair=True)
    ch = S64._ranges_steploop64(dev_compact, mat, lens, True, pair=False)
    same = int(
        np.asarray(
            jnp.sum(
                (
                    (ph[0] == ch[0]) & (ph[1] == ch[1])
                    & (ph[2] == ch[2]) & (ph[3] == ch[3])
                ).astype(jnp.int32)
            )
        )
    )
    assert same == Q, same
    log("layouts agree")

    def run_pair():
        r = S64._ranges_steploop64(dev_pair, mat, lens, True, pair=True)
        sync(r[1])

    def run_pair_classic():
        # pair-fused rows, classic two-gather step: isolates the row-size
        # cost from the one-gather win
        r = S64._ranges_steploop64(dev_pair, mat, lens, True, pair=False)
        sync(r[1])

    def run_compact():
        r = S64._ranges_steploop64(dev_compact, mat, lens, True, pair=False)
        sync(r[1])

    interleave(
        [
            ("aa_pair512", run_pair),
            ("aa_classic512", run_pair_classic),
            ("aa_classic384", run_compact),
        ]
    )
    log("done")


if __name__ == "__main__":
    main()
