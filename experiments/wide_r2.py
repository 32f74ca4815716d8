"""Wide (hi/lo u64) path vs 32-bit path on the real chip (64M bases).

The wide layout exists for capacity parity (bwtLength >= 2^32); this
measures its throughput cost on an index both paths can hold, now that
its rows are pair-fused (one-gather seeded steps). Protocol-matched:
both paths take a HOST letters matrix (the wide loop has no
device-resident-matrix variant), and timing syncs on a scalar readback
(never pull the 1M-range arrays through the tunnel).

Stages: seeded 25-mer range search — pair one-gather wide, classic
two-gather wide, and the 32-bit pair steploop.
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
from avxwindowfmindex_tpu import search as S
from avxwindowfmindex_tpu import search64 as S64

NUM_BASES = 64_000_000
Q = 1 << 20
KMER_LEN = 25
SEED_K = 12
REPS = 4


def log(m):
    print(f"[wide] {m}", file=sys.stderr, flush=True)


def sync(*arrs):
    return int(np.asarray(jnp.sum(arrs[0][:1].astype(jnp.uint32))))


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
    t0 = time.time()
    index = create_index(seq.tobytes(), cfg)
    log(f"index built in {time.time() - t0:.0f}s")
    dev32 = index.to_device()
    dev64 = index.to_device(refresh=True, wide=True)

    starts = rng.integers(0, NUM_BASES - KMER_LEN, size=Q)
    windows = np.lib.stride_tricks.sliding_window_view(seq, KMER_LEN)
    mat = np.ascontiguousarray(alpha.NT_ASCII_TO_INDEX[windows[starts]])
    lens = np.full(Q, KMER_LEN, dtype=np.int32)

    # answers must agree across layouts (device-side comparison)
    sh, sl, eh, el, _bad = S64._ranges_steploop64(dev64, mat, lens, True, pair=True)
    s32, e32 = S._ranges_steploop(dev32, mat, lens, seeded=True)
    same = int(
        np.asarray(
            jnp.sum(
                (
                    (sh == 0) & (sl == s32) & (eh == 0) & (el == e32)
                ).astype(jnp.int32)
            )
        )
    )
    assert same == Q, same
    log("wide ranges identical to 32-bit")

    def run_wide_pair():
        sh, sl, eh, el, _ = S64._ranges_steploop64(dev64, mat, lens, True, pair=True)
        sync(sl)

    def run_wide_classic():
        sh, sl, eh, el, _ = S64._ranges_steploop64(dev64, mat, lens, True, pair=False)
        sync(sl)

    def run_32_pair():
        s, e = S._ranges_steploop(dev32, mat, lens, seeded=True)
        sync(s)

    interleave(
        [
            ("wide_pair", run_wide_pair),
            ("wide_classic", run_wide_classic),
            ("narrow_pair", run_32_pair),
        ]
    )
    log("done")


if __name__ == "__main__":
    main()
