"""A/B: query matrix resident on device vs transferred per step.

_ngram_ranges_steploop slices letter columns out of the query matrix
with jnp.asarray(mat[:, c]) — when mat is NumPy, that is a fresh
host->device transfer per fused step group, through the tunnel, on
every call. This measures digram count and single count with mat
pre-uploaded (jnp) vs host (np), interleaved in one process.

Also: gather-only floor — 7 pair-row gathers + trivial byte reduce,
no rank math — to bound the non-gather cost of a full count.
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
    print(f"[ab3] {m}", file=sys.stderr, flush=True)


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
    log("index + digram built")

    starts = rng.integers(0, NUM_BASES - KMER_LEN, size=Q)
    windows = np.lib.stride_tricks.sliding_window_view(seq, KMER_LEN)
    mat_np = alpha.NT_ASCII_TO_INDEX[windows[starts]]
    mat_dev = jax.block_until_ready(jnp.asarray(mat_np))

    def count_digram(mat):
        s, e = S._ngram_ranges_steploop(
            dev, dig, mat, kmer_len=KMER_LEN, seed_k=SEED_K
        )
        c = jnp.where(s <= e, e - s + jnp.uint32(1), jnp.uint32(0))
        _ = int(np.asarray(c[0]))

    log("stage 1: digram count, device vs host mat")
    interleave(
        [
            ("mat_dev", lambda: count_digram(mat_dev)),
            ("mat_np", lambda: count_digram(mat_np)),
        ]
    )

    # gather-only floor: 7 random pair-row fetches + byte reduce
    nrows = dig.packed.shape[0]
    idx = [
        jax.block_until_ready(
            jnp.asarray(
                rng.integers(0, nrows, size=Q, dtype=np.int32)
            )
        )
        for _ in range(7)
    ]

    @jax.jit
    def gather7(table, *idxs):
        acc = jnp.uint32(0)
        for ix in idxs:
            acc = acc + jnp.sum(table[ix][:, 0].astype(jnp.uint32))
        return acc

    def gather_floor():
        _ = int(np.asarray(gather7(dig.packed, *idx)))

    log("stage 2: gather-only floor vs full digram count (device mat)")
    interleave(
        [
            ("gather7", gather_floor),
            ("full_count", lambda: count_digram(mat_dev)),
        ]
    )
    log(f"pair row bytes: {dig.packed.shape}")
    log("done")


if __name__ == "__main__":
    main()
