"""Measure the sync-free NESTED-compaction backtrace schedule.

Prior tuned schedule (scatter-every-round + synced tail): 0.317-0.42 s
per 1M hits incl. resolve. The nested schedule eliminates every host
sync and shrinks the nonzero cost with each level; this run times it
single-LF and pair-LF, plus the e2e locate_all headline with digram vs
single-step range search.
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
from avxwindowfmindex_tpu.ops import bt_digram, ngram as ngram_ops
from avxwindowfmindex_tpu import search as S

NUM_BASES = 64_000_000
Q = 1 << 20
KMER_LEN = 25
SEED_K = 12
REPS = 4


def log(m):
    print(f"[btnested] {m}", file=sys.stderr, flush=True)


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
    lens = np.full(Q, KMER_LEN, dtype=np.int32)
    s0, e0 = S._ngram_ranges_steploop(
        dev, dig, mat, kmer_len=KMER_LEN, seed_k=SEED_K
    )
    pos0 = jax.block_until_ready(jnp.where(s0 <= e0, s0, jnp.uint32(0)))
    log("positions ready")

    # the nested schedule must produce the reference walk
    p0, off0 = S.backtrace_all(dev, pos0)
    ref = np.asarray(S._resolve_samples(dev, p0, off0))
    p1, off1 = S.backtrace_all(dev, pos0, bt)
    got = np.asarray(S._resolve_samples(dev, p1, off1))
    assert (ref == got).all()
    exp = (np.asarray(pos0) != 0).sum()
    log(f"single/pair walks agree; {exp} live positions")

    def sync(x):
        _ = int(np.asarray(x[0]))

    def run_bt(b):
        p, off = S.backtrace_all(dev, pos0, b)
        sync(S._resolve_samples(dev, p, off))

    interleave(
        [
            ("nested_single", lambda: run_bt(None)),
            ("nested_pair", lambda: run_bt(bt)),
        ]
    )

    cap = S._round_up(S.total_hits_host(s0, e0), 65536)

    def run_e2e(single_ranges):
        if single_ranges:
            s, e = S._ranges_steploop(dev, mat, lens, seeded=True)
        else:
            s, e = S._ngram_ranges_steploop(
                dev, dig, mat, kmer_len=KMER_LEN, seed_k=SEED_K
            )
        hits, _qid, _mask = S.locate_flat_device(dev, s, e, capacity=cap)
        sync(hits)

    interleave(
        [
            ("e2e_digram", lambda: run_e2e(False)),
            ("e2e_1step", lambda: run_e2e(True)),
        ]
    )
    log("done")


if __name__ == "__main__":
    main()
