"""Gather locality: does sorting/bucketing indices speed row gathers?

SURVEY.md §7 "Gather-bound rank" named sorting queries/positions by
block index as a possible lever; it was never tried (VERDICT r2,
missing #3). Two measurements on v5e:

1. Raw gather rate vs index order — random / bucket-sorted (high byte)
   / fully sorted / sequential — on the real 64M-base tables (128 B
   single rows, 384 B digram pair rows; 250k rows each, cache-friendly)
   AND on synthetic 4 GB / 3 GB tables matching hg38-scale row counts,
   where gathers are the measured bottleneck. The kernel consumes every
   row byte (see bench._calibrate_gather_rates for why) and uses
   step-constant offsets so sortedness persists across fused steps;
   lo/hi-seg differencing cancels dispatch+sync overhead.

2. End-to-end locate_all with the initial backtrace positions sorted
   (argsort + inverse scatter around backtrace_all) vs the default
   range order. Only the first LF pass sees sorted addresses (LF
   scrambles them), so this bounds what pipeline-level sorting can buy.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import functools

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
    total_hits_host,
)

NUM_BASES = int(os.environ.get("AWFM_AB_BASES", 64_000_000))
B = int(os.environ.get("AWFM_AB_BATCH", 1 << 20))
KMER_LEN = 25
SEED_K = 12
REPS = int(os.environ.get("AWFM_AB_REPS", 5))
SEG_LO, SEG_HI = 4, 20


def log(m):
    print(f"[locality] {m}", file=sys.stderr, flush=True)


@functools.partial(jax.jit, static_argnames=("seg",))
def gathers(table, idx, *, seg):
    """seg independent full-row gathers of (idx + const) per step.

    Step-constant offsets keep a sorted idx sorted at every step; the
    row-sum consume forces the full-row fetch (no gather narrowing).
    """
    nb = table.shape[0]
    acc = jnp.uint32(0)
    for s in range(seg):
        shifted = jnp.minimum(
            idx + jnp.int32(7 * s), jnp.int32(nb - 1)
        )
        rows = table[shifted]
        acc = acc + jnp.sum(rows.astype(jnp.uint32))
    return acc


def time_rate(table, idx, reps=REPS):
    """(rows/s) by lo/hi-seg differencing with scalar-readback syncs."""

    def run(seg):
        _ = int(np.asarray(gathers(table, idx, seg=seg)))

    run(SEG_LO)
    run(SEG_HI)
    lo_t, hi_t = [], []
    for _ in range(reps):
        t0 = time.time()
        run(SEG_LO)
        lo_t.append(time.time() - t0)
        t0 = time.time()
        run(SEG_HI)
        hi_t.append(time.time() - t0)
    dt = float(np.median(hi_t)) - float(np.median(lo_t))
    if dt <= 0:
        dt = float(np.median(hi_t))
        return idx.shape[0] * SEG_HI / dt
    return idx.shape[0] * (SEG_HI - SEG_LO) / dt


def orderings(rng, nb, b):
    base = rng.integers(0, nb, size=b).astype(np.int32)
    srt = np.sort(base)
    # bucket by high bits (256 buckets), random within each bucket:
    # the coarse locality a cheap radix partition could achieve
    shift = max(0, int(nb - 1).bit_length() - 8)
    bucketed = base[np.argsort(base >> shift, kind="stable")]
    seq = (np.arange(b, dtype=np.int64) * nb // b).astype(np.int32)
    return {
        "random": base,
        "bucket256": bucketed,
        "sorted": srt,
        "sequential": seq,
    }


def main():
    rng = np.random.default_rng(1234)
    out = {"exp": "gather_locality"}

    # synthetic hg38-scale tables first (built on device; no host xfer)
    key = jax.random.PRNGKey(0)
    synth_shift = int(os.environ.get("AWFM_AB_SYNTH_SHIFT", 24))
    for name, (rows, rb) in {
        f"synth_{(256 << synth_shift) >> 30}g_256B": (1 << synth_shift, 256),
        f"synth_{(384 << (synth_shift - 1)) >> 30}g_384B": (
            1 << (synth_shift - 1), 384,
        ),
    }.items():
        # uint8 directly — randint(int32).astype(u8) materializes a 4x
        # intermediate (16 GB for the 4 GB table: measured OOM)
        table = jax.block_until_ready(
            jax.jit(lambda k: jax.random.bits(k, (rows, rb), dtype=jnp.uint8))(
                key
            )
        )
        res = {}
        for oname, idx in orderings(rng, rows, B).items():
            idx_dev = jax.block_until_ready(jnp.asarray(idx))
            res[oname] = round(time_rate(table, idx_dev) / 1e6, 1)
        out[name] = res
        log(f"{name}: {res} (M rows/s)")
        del table

    # real 64M-base tables
    seq = rng.choice(np.frombuffer(b"acgt", np.uint8), size=NUM_BASES)
    cfg = IndexConfiguration(
        suffix_array_compression_ratio=8,
        kmer_length_in_seed_table=SEED_K,
        alphabet_type=AlphabetType.DNA,
    )
    log("building 64M index")
    index = create_index(seq.tobytes(), cfg)
    dev = index.to_device()
    dig = ngram_ops.build_ngram_device(index, 2)
    for name, table in {
        "real_single_128B": dev.packed,
        "real_digram_384B": dig.packed,
    }.items():
        nb = table.shape[0]
        res = {}
        for oname, idx in orderings(rng, nb, B).items():
            idx_dev = jax.block_until_ready(jnp.asarray(idx))
            res[oname] = round(time_rate(table, idx_dev) / 1e6, 1)
        out[name] = res
        log(f"{name}: {res} (M rows/s)")
    print(json.dumps(out), flush=True)

    # end-to-end: locate_all with sorted initial backtrace positions
    starts = rng.integers(0, NUM_BASES - KMER_LEN, size=B)
    windows = np.lib.stride_tricks.sliding_window_view(seq, KMER_LEN)
    mat = jnp.asarray(
        np.ascontiguousarray(alpha.NT_ASCII_TO_INDEX[windows[starts]])
    )
    jax.block_until_ready(mat)
    s, e = _ngram_ranges_steploop(dev, dig, mat, kmer_len=KMER_LEN, seed_k=SEED_K)
    cap = _round_up(total_hits_host(s, e), 65536)
    from avxwindowfmindex_tpu.search import enumerate_range_positions

    @functools.partial(jax.jit, static_argnames=("capacity",))
    def enum_sorted(s, e, *, capacity):
        pos, qid, mask = enumerate_range_positions(s, e, capacity=capacity)
        order = jnp.argsort(pos)
        return pos[order], order

    def run_default():
        s, e = _ngram_ranges_steploop(
            dev, dig, mat, kmer_len=KMER_LEN, seed_k=SEED_K
        )
        pos, _qid, _mask = enumerate_range_positions(s, e, capacity=cap)
        p, off = backtrace_all(dev, pos)
        hits = _resolve_samples(dev, p, off)
        _ = int(np.asarray(jnp.sum(hits[:1])))

    def run_sorted():
        s, e = _ngram_ranges_steploop(
            dev, dig, mat, kmer_len=KMER_LEN, seed_k=SEED_K
        )
        pos_s, order = enum_sorted(s, e, capacity=cap)
        p, off = backtrace_all(dev, pos_s)
        hits_s = _resolve_samples(dev, p, off)
        hits = jnp.zeros_like(hits_s).at[order].set(hits_s)
        _ = int(np.asarray(jnp.sum(hits[:1])))

    for fn in (run_default, run_sorted):
        fn()
    times = {"locate_default": [], "locate_sorted_bt": []}
    for _ in range(REPS):
        t0 = time.time()
        run_default()
        times["locate_default"].append(time.time() - t0)
        t0 = time.time()
        run_sorted()
        times["locate_sorted_bt"].append(time.time() - t0)
    out2 = {"exp": "locate_sorted_backtrace", "capacity": cap}
    for k, v in times.items():
        out2[k] = round(float(np.median(v)), 4)
        out2[f"{k}_times"] = [round(t, 4) for t in v]
    print(json.dumps(out2), flush=True)
    log("done")


if __name__ == "__main__":
    main()
