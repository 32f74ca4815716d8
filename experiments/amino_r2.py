"""Amino throughput after the device-mat fix (VERDICT item 5).

Round 1 measured amino count ~0.43M q/s and blamed 15 serial dispatch
steps; round 2 showed the real cost was per-step host->device column
transfers. This re-measures amino count + locate-first-hit with the
device-resident batch path, pair rows on/off.
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

NUM_LETTERS = 16_000_000
Q = 1 << 20
KMER_LEN = 20
SEED_K = 5
REPS = 4
AA = b"ACDEFGHIKLMNPQRSTVWY"


def log(m):
    print(f"[aa] {m}", file=sys.stderr, flush=True)


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
    import os

    rng = np.random.default_rng(1234)
    seq = rng.choice(np.frombuffer(AA, np.uint8), size=NUM_LETTERS)
    cfg = IndexConfiguration(
        suffix_array_compression_ratio=8,
        kmer_length_in_seed_table=SEED_K,
        alphabet_type=AlphabetType.AMINO,
    )
    log("building amino index")
    index = create_index(seq.tobytes(), cfg)
    dev = index.to_device()

    starts = rng.integers(0, NUM_LETTERS - KMER_LEN, size=Q)
    windows = np.lib.stride_tricks.sliding_window_view(seq, KMER_LEN)
    mat = jax.block_until_ready(
        jnp.asarray(alpha.AA_ASCII_TO_INDEX[windows[starts]])
    )
    lengths = np.full(Q, KMER_LEN, dtype=np.int32)

    def count(pair):
        os.environ["AWFM_PAIR_ROWS"] = "1" if pair else "0"
        try:
            s, e = S._ranges_steploop(dev, mat, lengths, seeded=True)
            c = jnp.where(s <= e, e - s + jnp.uint32(1), jnp.uint32(0))
            _ = int(np.asarray(c[0]))
        finally:
            os.environ["AWFM_PAIR_ROWS"] = "1"

    log("stage 1: amino count pair on/off")
    interleave(
        [
            ("aa_count_pair", lambda: count(True)),
            ("aa_count_classic", lambda: count(False)),
        ]
    )

    def locate():
        s, e = S._ranges_steploop(dev, mat, lengths, seeded=True)
        pos = jnp.where(s <= e, s, jnp.uint32(0))
        p, off = S.backtrace_all(dev, pos)
        hits = S._resolve_samples(dev, p, off)
        _ = int(np.asarray(hits[0]))

    log("stage 2: amino locate first hit")
    interleave([("aa_locate", locate)])
    log("done")


if __name__ == "__main__":
    main()
