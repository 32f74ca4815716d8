"""Does the pair-LF backtrace win at gather-bound scale? (hg38, v5e)

At 64M bases the tables are cache-assisted and the pair kernel's VPU
cost loses (ab_r2_btsched). At genome scale gathers pay full HBM
latency, which is exactly what halving the walk gathers targets.

FINDING (first run): at the full 3.1G bases the resident tables
(single 1.55 + pair 3.1 + SA 1.55 + seed 0.13 + bt 4.65 GB ~ 11 GB)
plus the fused pair program's live gather intermediates exhaust the
16 GB chip (RESOURCE_EXHAUSTED in _backtrace_pair_steps_fused) — the
opt-in bt table cannot coexist with the full search table set at hg38
scale on v5e; AWFM_BT_HG38_BASES defaults to 1.5G, still far past the
cache-assist regime, to answer the gather-bound question.
"""

import os

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
from avxwindowfmindex_tpu.ops import bt_digram
from avxwindowfmindex_tpu import search as S

NUM_BASES = int(os.environ.get("AWFM_BT_HG38_BASES", 1_500_000_000))
Q = 1 << 20
KMER_LEN = 25
SEED_K = 12
REPS = 4


def log(m):
    print(f"[bt38] {m}", file=sys.stderr, flush=True)


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
    log("building index (host, ~40 min)")
    t0 = time.time()
    index = create_index(seq.tobytes(), cfg)
    log(f"index built in {time.time() - t0:.0f}s")
    dev = index.to_device()
    t0 = time.time()
    bt = bt_digram.build_backtrace_digram_device(index)
    log(f"bt table built in {time.time() - t0:.0f}s")

    starts = rng.integers(0, NUM_BASES - KMER_LEN, size=Q)
    windows = np.lib.stride_tricks.sliding_window_view(seq, KMER_LEN)
    mat = jax.block_until_ready(
        jnp.asarray(alpha.NT_ASCII_TO_INDEX[windows[starts]])
    )
    lens = np.full(Q, KMER_LEN, dtype=np.int32)
    s0, e0 = S._ranges_steploop(dev, mat, lens, seeded=True)
    pos0 = jax.block_until_ready(jnp.where(s0 <= e0, s0, jnp.uint32(0)))
    log("positions ready")

    # answers must agree (device-side comparison; no bulk d2h)
    p0, off0 = S.backtrace_all(dev, pos0)
    p1, off1 = S.backtrace_all(dev, pos0, bt)
    same = int(np.asarray(jnp.sum(((p0 == p1) & (off0 == off1)).astype(jnp.int32))))
    assert same == Q, same
    log("pair walk identical at hg38 scale")

    def run_bt(b):
        p, off = S.backtrace_all(dev, pos0, b)
        hits = S._resolve_samples(dev, p, off)
        _ = int(np.asarray(hits[0]))

    interleave(
        [
            ("hg38_single", lambda: run_bt(None)),
            ("hg38_pair", lambda: run_bt(bt)),
        ]
    )

    cap = S._round_up(S.total_hits_host(s0, e0), 65536)

    def run_e2e(b):
        pend = []
        s, e = S._ranges_steploop(dev, mat, lens, seeded=True, defer=pend)
        hits, _qid, _mask = S.locate_flat_device(dev, s, e, capacity=cap, bt=b)
        vals = np.asarray(
            jnp.concatenate(
                [hits[:1]] + [c[None].astype(jnp.uint32) for c, _ in pend]
            )
        )
        assert not vals[1:].any()  # random corpus: no pair-window flags

    interleave(
        [
            ("e2e_single", lambda: run_e2e(None)),
            ("e2e_pair", lambda: run_e2e(bt)),
        ]
    )
    log("done")


if __name__ == "__main__":
    main()
