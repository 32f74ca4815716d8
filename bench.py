"""Headline benchmark: batched k-mer search throughput on TPU.

Mirrors the reference's measurement harness (tuning/search/timeSearch.c:
sample valid kmers from the source sequence, time
awFmParallelSearchLocate/Count over repeated runs) on the flagship
BASELINE.json config: 25-mer nucleotide count+locate over a
genome-scale index, seed table k=12, SA ratio 8.

Timing hygiene (learned from round 1's driver-run anomaly, where the
first timed stage absorbed a ~500 s device-lease stall and reported 7x
below controlled measurements): every stage discards one timed warm-up
run after compilation, then reports the MEDIAN of AWFM_BENCH_RUNS runs
with the per-run times in the meta line, so a single tunnel stall or
host hiccup cannot poison the headline.

Prints ONE JSON headline line:
  {"metric": ..., "value": N, "unit": "queries/s", "vs_baseline": N}

The headline is full-hit-list locate (every position of every range
resolved, AwFmSearch.c:161-246 / AwFmParallelSearch.c:315-365), the
reference's real locate workload. vs_baseline denominator: the
reference's 64-thread AVX2 CPU throughput for this workload. The repo
publishes no numbers (BASELINE.md), so we use a cost-model estimate
pinned here for cross-round comparability: each seeded 25-mer does 13
extension steps x 2 block fetches; a 2-socket 64-thread x86 server
sustains ~150M random cache-line fetches/s from DRAM, giving ~2.5M
locate-queries/s (count ~3.5M/s). These match the rank-step cost model
in BASELINE.md and err generous toward the CPU.
"""

from __future__ import annotations

import json
import os
import socket
import time

import sys

import numpy as np


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


# Local relay ports the axon PJRT plugin dials (the container is
# zero-egress; the relay is the only path to the TPU). If the relay
# daemon has died, the first device op freezes in a retry loop forever —
# fail loudly instead so the driver records a clean error, not a hang.
_RELAY_PORTS = (8082, 8083, 8087, 8092)


def _await_relay():
    """Fail fast (exit 2) if the TPU tunnel is down, after a grace wait.

    No-op off the tunnel: skipped when JAX_PLATFORMS requests cpu, when
    the axon env marker is absent, or with AWFM_BENCH_SKIP_PROBE=1.
    """
    if os.environ.get("AWFM_BENCH_SKIP_PROBE") == "1":
        return
    if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
        return
    if not os.environ.get("PALLAS_AXON_POOL_IPS"):
        return
    wait_s = float(os.environ.get("AWFM_BENCH_RELAY_WAIT_S", 300))
    deadline = time.time() + wait_s
    while True:
        for port in _RELAY_PORTS:
            s = socket.socket()
            s.settimeout(2)
            try:
                s.connect(("127.0.0.1", port))
                return
            except OSError:
                pass
            finally:
                s.close()
        if time.time() >= deadline:
            _log(
                f"TPU relay unreachable on ports {_RELAY_PORTS} after "
                f"{wait_s:.0f}s — the first device op would hang forever; "
                "aborting (AWFM_BENCH_SKIP_PROBE=1 overrides)"
            )
            sys.exit(2)
        _log("TPU relay not reachable yet; retrying in 15s")
        time.sleep(15)


BASELINE_COUNT_QPS = 3.5e6
BASELINE_LOCATE_QPS = 2.5e6

NUM_BASES = int(os.environ.get("AWFM_BENCH_BASES", 64_000_000))
# 1M queries = one compiled chunk shape; every published number uses
# this protocol. AWFM_BENCH_QUERIES=4194304 runs 4 chunks and amortizes
# each stage's single host sync over 4x the work (~+4% expected).
NUM_QUERIES = int(os.environ.get("AWFM_BENCH_QUERIES", 1_048_576))
KMER_LEN = int(os.environ.get("AWFM_BENCH_KMER_LEN", 25))
SEED_K = int(os.environ.get("AWFM_BENCH_SEED_K", 12))
RUNS = int(os.environ.get("AWFM_BENCH_RUNS", 5))


def _time_stage(name, fn, runs=None):
    """Compile + warm-up (discarded) + median-of-N timed runs.

    Returns (median_seconds, [per-run seconds]). The discarded warm-up
    absorbs one-off stalls (device-lease recovery, cache residency).
    """
    _log(f"compiling {name}")
    fn()
    t0 = time.time()
    fn()
    _log(f"{name} warm-up (discarded): {time.time() - t0:.3f}s")
    times = []
    for _ in range(runs or RUNS):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    med = float(np.median(times))
    _log(f"{name}: median {med:.3f}s of {[round(t, 3) for t in times]}")
    return med, [round(t, 4) for t in times]


def main():
    global NUM_QUERIES
    _await_relay()
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()

    from avxwindowfmindex_tpu import IndexConfiguration, AlphabetType, SearchEngine, create_index
    from avxwindowfmindex_tpu.ops import ngram as ngram_ops
    from avxwindowfmindex_tpu.search import (
        _ngram_ranges_steploop,
        _ranges_steploop,
        _resolve_samples,
        _round_up,
        total_hits_host,
        backtrace_all,
        locate_flat_device,
    )

    t_start = time.time()
    rng = np.random.default_rng(1234)
    seq_arr = rng.choice(np.frombuffer(b"acgt", np.uint8), size=NUM_BASES)
    cfg = IndexConfiguration(
        suffix_array_compression_ratio=8,
        kmer_length_in_seed_table=SEED_K,
        alphabet_type=AlphabetType.DNA,
    )
    _log(f"building index: {NUM_BASES} bases, seed k={SEED_K}")
    t0 = time.time()
    index = create_index(seq_arr.tobytes(), cfg)
    build_s = time.time() - t0
    _log(f"index built in {build_s:.1f}s")
    dev = index.to_device()
    ngram_n = int(os.environ.get("AWFM_BENCH_NGRAM", 2))
    t0 = time.time()
    dig = ngram_ops.build_ngram_device(index, ngram_n)
    digram_build_s = time.time() - t0
    _log(f"{ngram_n}-gram index built in {digram_build_s:.1f}s")

    # sample query kmers from the sequence (guaranteed hits, like
    # timeSearch.c's kmer sampling)
    starts = rng.integers(0, NUM_BASES - KMER_LEN, size=NUM_QUERIES)
    windows = np.lib.stride_tricks.sliding_window_view(seq_arr, KMER_LEN)
    kmer_mat_ascii = windows[starts]
    from avxwindowfmindex_tpu.models import alphabet as alpha

    mat = alpha.NT_ASCII_TO_INDEX[kmer_mat_ascii]

    # fixed-size chunks: one compiled shape regardless of NUM_QUERIES
    # (large-shape compiles through a remote TPU compiler take minutes)
    # big chunks amortize per-dispatch overhead on serial step chains
    chunk_q = min(NUM_QUERIES, 1_048_576)
    if NUM_QUERIES % chunk_q != 0:  # round down to a whole number of chunks
        NUM_QUERIES = (NUM_QUERIES // chunk_q) * chunk_q
    # the query batch is uploaded ONCE and the timed stages measure
    # steady-state device throughput. On a production host<->TPU link
    # this upload is ~milliseconds (25 MB over PCIe); the measurement
    # tunnel inflates host->device ~100x, so folding it into every
    # timed run would benchmark the tunnel, not the engine. The actual
    # one-time cost is reported as query_upload_seconds.
    t0 = time.time()
    chunks = [
        jax.block_until_ready(jnp.asarray(mat[lo : lo + chunk_q]))
        for lo in range(0, NUM_QUERIES, chunk_q)
    ]
    upload_s = time.time() - t0
    _log(f"query upload: {upload_s:.2f}s for {NUM_QUERIES} kmers")
    chunk_len = np.full(chunk_q, KMER_LEN, dtype=np.int32)

    def _finish(total, pend, redo_fn):
        """ONE combined readback of the result + all deferred pair-window
        flag counts; a flagged batch (rare: ranges wider than 512 mid-
        extension) falls back to the exact synchronous formulation."""
        vals = np.asarray(
            jnp.concatenate(
                [total[None]] + [c[None].astype(jnp.uint32) for c, _ in pend]
            )
        )
        if len(vals) > 1 and vals[1:].any():
            _log("pair-window flags present; re-running stage exactly")
            redo_fn()

    def run_count(defer=True):
        total = jnp.uint32(0)
        pend = []
        for cm in chunks:
            s, e = _ranges_steploop(
                dev, cm, chunk_len, seeded=True, defer=pend if defer else None
            )
            counts = jnp.where(s <= e, e - s + jnp.uint32(1), jnp.uint32(0))
            total = total + counts[0]
        if not defer:
            _ = int(np.asarray(total))
            return
        _finish(total, pend, lambda: run_count(defer=False))

    med, count_times = _time_stage("count_step", run_count)
    count_qps = NUM_QUERIES / med

    # double-step (digram) count: two letters per gather
    def run_count2(defer=True):
        total = jnp.uint32(0)
        pend = []
        for cm in chunks:
            s, e = _ngram_ranges_steploop(
                dev, dig, cm, kmer_len=KMER_LEN, seed_k=SEED_K,
                defer=pend if defer else None,
            )
            c = jnp.where(s <= e, e - s + jnp.uint32(1), jnp.uint32(0))
            total = total + c[0]
        if not defer:
            _ = int(np.asarray(total))
            return
        _finish(total, pend, lambda: run_count2(defer=False))

    med, count2_times = _time_stage("digram_count", run_count2)
    count2_qps = NUM_QUERIES / med

    # locate (first hit): resolve the range start of every query — the
    # per-hit backtrace cost in isolation. Locate stages use digram
    # ranges: with the fixup readback deferred they are the fastest
    # range finder again (0.126 vs 0.159 s per 1M in run6).
    def locate_step(cm, pend):
        s, e = _ngram_ranges_steploop(
            dev, dig, cm, kmer_len=KMER_LEN, seed_k=SEED_K, defer=pend
        )
        valid = s <= e
        pos = jnp.where(valid, s, jnp.uint32(0))
        p, off = backtrace_all(dev, pos)
        hits = _resolve_samples(dev, p, off)
        return jnp.where(valid, hits, jnp.uint32(0))

    def run_locate(defer=True):
        total = jnp.uint32(0)
        pend = []
        for cm in chunks:
            hits = locate_step(cm, pend if defer else None)
            total = total + hits[0]
        if not defer:
            _ = int(np.asarray(total))
            return
        _finish(total, pend, lambda: run_locate(defer=False))

    med, locate_times = _time_stage("locate_first_hit", run_locate)
    locate_qps = NUM_QUERIES / med

    # locate (full hit list): resolve EVERY position of every range —
    # the reference's actual locate workload (AwFmParallelSearch.c:
    # 315-365). Capacity sized per chunk from the true total (rounded
    # coarsely so every chunk shares one compiled shape).
    chunk_ranges = []
    total_hits = 0
    for cm in chunks:
        s, e = _ngram_ranges_steploop(
            dev, dig, cm, kmer_len=KMER_LEN, seed_k=SEED_K
        )
        chunk_ranges.append((s, e))
        total_hits += total_hits_host(s, e)
    cap = _round_up(
        max(total_hits_host(s, e) for s, e in chunk_ranges), 65536
    )
    _log(f"total hits {total_hits} over {NUM_QUERIES} queries; capacity {cap}")

    def run_locate_all(defer=True):
        total = jnp.uint32(0)
        pend = []
        for cm in chunks:
            s, e = _ngram_ranges_steploop(
                dev, dig, cm, kmer_len=KMER_LEN, seed_k=SEED_K,
                defer=pend if defer else None,
            )
            hits, _qid, mask = locate_flat_device(dev, s, e, capacity=cap)
            total = total + hits[0]
        if not defer:
            _ = int(np.asarray(total))
            return
        _finish(total, pend, lambda: run_locate_all(defer=False))

    med, locate_all_times = _time_stage("locate_all", run_locate_all)
    locate_all_qps = NUM_QUERIES / med
    locate_all_hps = total_hits / med

    # optional profiler trace of one locate pass (jax.profiler; view
    # with tensorboard or xprof) — SURVEY.md §5 tracing subsystem
    profile_dir = os.environ.get("AWFM_BENCH_PROFILE")
    if profile_dir:
        _log(f"capturing profiler trace to {profile_dir}")
        with jax.profiler.trace(profile_dir):
            run_locate_all()

    # correctness spot check on a small subsample vs positions sampled in
    sample = rng.integers(0, NUM_QUERIES, size=64)
    engine = SearchEngine(index)
    sample_kmers = [kmer_mat_ascii[i].tobytes() for i in sample]
    check = engine.count(sample_kmers)
    assert (check >= 1).all(), "sampled kmers must occur at least once"

    from avxwindowfmindex_tpu.utils import roofline

    count_roof = roofline.report(
        count_qps, KMER_LEN, SEED_K, 8, dev.row_bytes, locate=False
    )
    locate_roof = roofline.report(
        locate_qps, KMER_LEN, SEED_K, 8, dev.row_bytes, locate=True
    )
    meta = {
        "device": str(jax.devices()[0]),
        "num_bases": NUM_BASES,
        "num_queries": NUM_QUERIES,
        "kmer_len": KMER_LEN,
        "seed_k": SEED_K,
        "runs": RUNS,
        "build_seconds": round(build_s, 2),
        "digram_build_seconds": round(digram_build_s, 2),
        "query_upload_seconds": round(upload_s, 2),
        "count_qps": round(count_qps),
        "count_times": count_times,
        "count_ngram_qps": round(count2_qps),
        "count_ngram_times": count2_times,
        "ngram_n": ngram_n,
        "locate_first_hit_qps": round(locate_qps),
        "locate_first_hit_times": locate_times,
        "locate_all_qps": round(locate_all_qps),
        "locate_all_hits_per_sec": round(locate_all_hps),
        "locate_all_times": locate_all_times,
        "total_hits": total_hits,
        "total_seconds": round(time.time() - t_start, 1),
        "count_roofline": count_roof,
        "locate_roofline": locate_roof,
    }
    print(json.dumps({"meta": meta}))
    print(
        json.dumps(
            {
                "metric": "nt25_locate_all_queries_per_sec",
                "value": round(locate_all_qps),
                "unit": "queries/s",
                "vs_baseline": round(locate_all_qps / BASELINE_LOCATE_QPS, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
