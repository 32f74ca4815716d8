"""Seed-table k = 12 vs 13 vs 14 on the flagship protocol (v5e).

The reference treats kmerLengthInSeedTable as THE tuning knob
(/root/reference/README.md:196-202): each +1 of k removes one extension
letter per query at 4x the table memory. On the digram engine the win
is lumpy: 25-mers at k=12 need 13 extension letters = 6 pair-digram
gathers + 1 single tail; k=13 needs 12 letters = 6 digram gathers (the
tail disappears — parity alignment with n=2); k=14 needs 11 = 5 + 1.

Tables: k=12 134 MB, k=13 536 MB, k=14 2.1 GB (u32 pairs, device).
Builds reuse ONE 64M-base index; extra tables are built device-side
with ops/seed_table.build_seed_table_device (never pulled to host —
bulk device->host through the tunnel runs ~0.3 MB/s).

Measures digram count, locate_first and locate_all at each k with the
bench.py defer protocol (one readback per batch), interleaved medians.
"""

import dataclasses
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
from avxwindowfmindex_tpu.ops import seed_table as seed_ops
from avxwindowfmindex_tpu.search import (
    _ngram_ranges_steploop,
    _resolve_samples,
    _round_up,
    backtrace_all,
    locate_flat_device,
    total_hits_host,
)

NUM_BASES = int(os.environ.get("AWFM_AB_BASES", 64_000_000))
Q = int(os.environ.get("AWFM_AB_QUERIES", 1 << 20))
KMER_LEN = 25
KS = tuple(
    int(k) for k in os.environ.get("AWFM_AB_KS", "12,13,14").split(",")
)
REPS = int(os.environ.get("AWFM_AB_REPS", 5))


def log(m):
    print(f"[seedk] {m}", file=sys.stderr, flush=True)


def sync(a):
    return int(np.asarray(jnp.sum(a[:1].astype(jnp.uint32))))


def interleave(pairs, reps=REPS):
    for _, fn in pairs:
        fn()  # warm-up (compile + cache residency), discarded
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
        kmer_length_in_seed_table=KS[0],
        alphabet_type=AlphabetType.DNA,
    )
    log(f"building index (k={KS[0]})")
    t0 = time.time()
    index = create_index(seq.tobytes(), cfg)
    log(f"built in {time.time() - t0:.0f}s")
    dev12 = index.to_device()
    dig = ngram_ops.build_ngram_device(index, 2)

    ps_host = index.prefix_sums
    devs = {KS[0]: dev12}
    build_secs = {}
    for k in KS[1:]:
        t0 = time.time()
        table = seed_ops.build_seed_table_device(
            dev12, 4, k, prefix_sums_host=ps_host
        )
        sync(table[:1, 0])
        build_secs[k] = round(time.time() - t0, 1)
        log(f"seed table k={k} built in {build_secs[k]}s")
        devs[k] = dataclasses.replace(
            dev12, seed_table=table, kmer_length_in_seed_table=k
        )
    print(json.dumps({"exp": "seedk_build_seconds", **{
        f"k{k}": v for k, v in build_secs.items()
    }}), flush=True)

    starts = rng.integers(0, NUM_BASES - KMER_LEN, size=Q)
    windows = np.lib.stride_tricks.sliding_window_view(seq, KMER_LEN)
    mat = jnp.asarray(
        np.ascontiguousarray(alpha.NT_ASCII_TO_INDEX[windows[starts]])
    )
    jax.block_until_ready(mat)

    # correctness: ranges must agree across all k (one readback)
    base = _ngram_ranges_steploop(
        devs[KS[0]], dig, mat, kmer_len=KMER_LEN, seed_k=KS[0]
    )
    agree = []
    for k in KS[1:]:
        s, e = _ngram_ranges_steploop(devs[k], dig, mat, kmer_len=KMER_LEN, seed_k=k)
        agree.append(jnp.sum(((s == base[0]) & (e == base[1])).astype(jnp.int32)))
    agree_h = np.asarray(jnp.stack(agree))
    assert (agree_h == Q).all(), agree_h
    log("ranges agree across k")

    def finish(total, pend):
        vals = np.asarray(
            jnp.concatenate(
                [total[None]] + [c[None].astype(jnp.uint32) for c, _ in pend]
            )
        )
        assert len(vals) == 1 or not vals[1:].any(), "pair-window flags"

    def make_count(k):
        dev = devs[k]

        def run():
            pend = []
            s, e = _ngram_ranges_steploop(
                dev, dig, mat, kmer_len=KMER_LEN, seed_k=k, defer=pend
            )
            c = jnp.where(s <= e, e - s + jnp.uint32(1), jnp.uint32(0))
            finish(c[0], pend)

        return run

    def make_locate_first(k):
        dev = devs[k]

        def run():
            pend = []
            s, e = _ngram_ranges_steploop(
                dev, dig, mat, kmer_len=KMER_LEN, seed_k=k, defer=pend
            )
            valid = s <= e
            pos = jnp.where(valid, s, jnp.uint32(0))
            p, off = backtrace_all(dev, pos)
            hits = _resolve_samples(dev, p, off)
            finish(jnp.where(valid, hits, jnp.uint32(0))[0], pend)

        return run

    s, e = base
    cap = _round_up(total_hits_host(s, e), 65536)
    log(f"locate capacity {cap}")

    def make_locate_all(k):
        dev = devs[k]

        def run():
            pend = []
            s, e = _ngram_ranges_steploop(
                dev, dig, mat, kmer_len=KMER_LEN, seed_k=k, defer=pend
            )
            hits, _qid, _mask = locate_flat_device(dev, s, e, capacity=cap)
            finish(hits[0], pend)

        return run

    interleave([(f"count_k{k}", make_count(k)) for k in KS])
    interleave([(f"locate_first_k{k}", make_locate_first(k)) for k in KS])
    interleave([(f"locate_all_k{k}", make_locate_all(k)) for k in KS])
    log("done")


if __name__ == "__main__":
    main()
