"""Amino throughput with the round-2 locate stack (nested backtrace,
deferred fixup): 16M-letter index, 1M x 20-mers, seed k=5, ratio 8.

Round-1 published 0.43M count / 0.36M locate (transfer-bound); the
device-matrix fix alone took count to 3.61M (amino_r2). This re-measures
count and adds locate_first + locate_all with the current schedule.
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
    print(f"[aa2b] {m}", file=sys.stderr, flush=True)


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
    rng = np.random.default_rng(4321)
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
    lens = np.full(Q, KMER_LEN, dtype=np.int32)
    log("queries ready")

    def sync(x):
        _ = int(np.asarray(x[0]))

    def finish(total, pend, redo):
        vals = np.asarray(
            jnp.concatenate(
                [total[None]] + [c[None].astype(jnp.uint32) for c, _ in pend]
            )
        )
        if len(vals) > 1 and vals[1:].any():
            log("flags present; sync re-run")
            redo()

    def run_count(defer=True):
        pend = []
        s, e = S._ranges_steploop(
            dev, mat, lens, seeded=True, defer=pend if defer else None
        )
        c = jnp.where(s <= e, e - s + jnp.uint32(1), jnp.uint32(0))
        if not defer:
            sync(c)
            return
        finish(c[0], pend, lambda: run_count(defer=False))

    def run_locate_first():
        pend = []
        s, e = S._ranges_steploop(dev, mat, lens, seeded=True, defer=pend)
        valid = s <= e
        pos = jnp.where(valid, s, jnp.uint32(0))
        p, off = S.backtrace_all(dev, pos)
        hits = S._resolve_samples(dev, p, off)
        finish(hits[0], pend, lambda: None)

    s0, e0 = S._ranges_steploop(dev, mat, lens, seeded=True)
    cap = S._round_up(S.total_hits_host(s0, e0), 65536)
    log(f"locate_all capacity {cap}")

    def run_locate_all():
        pend = []
        s, e = S._ranges_steploop(dev, mat, lens, seeded=True, defer=pend)
        hits, _qid, _mask = S.locate_flat_device(dev, s, e, capacity=cap)
        finish(hits[0], pend, lambda: None)

    interleave(
        [
            ("aa_count", run_count),
            ("aa_locate_first", run_locate_first),
            ("aa_locate_all", run_locate_all),
        ]
    )
    log("done")


if __name__ == "__main__":
    main()
