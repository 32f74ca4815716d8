"""A/B: rank arithmetic in u32 lanes vs u8 lanes.

TPU VPU lanes are 32-bit; u8 arrays occupy one lane PER BYTE, so the
(B, 64)-byte match/mask/popcount pipeline of the pair rank burns 4x
the lanes it needs. This prototypes the digram pair step with rows
viewed as (B, 16) u32 words per plane:

  variants (same math, bit-identical results, verified):
    u8      — current production formulation
    u32tab  — device table stored as u32; gather u32 rows directly
    u8cast  — u8 table + u8 gather, bitcast to u32 before the math

Also times the backtrace LF step (single 128-byte rows) u8 vs bitcast.
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from avxwindowfmindex_tpu import AlphabetType, IndexConfiguration, create_index
from avxwindowfmindex_tpu.models import alphabet as alpha
from avxwindowfmindex_tpu.ops import ngram as ngram_ops
from avxwindowfmindex_tpu.ops.ngram import _geometry_pair, _word_value
from avxwindowfmindex_tpu import search as S

NUM_BASES = 64_000_000
Q = 1 << 20
KMER_LEN = 25
SEED_K = 12
REPS = 4

_WORD_IOTA16 = np.arange(16, dtype=np.int32)


def log(m):
    print(f"[u32] {m}", file=sys.stderr, flush=True)


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


# ---- u32 digram pair step --------------------------------------------------

def _pair_match32(rows32, v, n_planes):
    diff = None
    for i in range(n_planes):
        m = jnp.where(
            ((v >> i) & 1) == 1, jnp.uint32(0xFFFFFFFF), jnp.uint32(0)
        )[:, None]
        x = rows32[:, i * 16 : (i + 1) * 16] ^ m
        diff = x if diff is None else (diff | x)
    return ~diff


def _pair_mask32(local):
    word_idx = (local >> 5)[:, None]
    bit = (local & 31)[:, None].astype(jnp.uint32)
    low = (jnp.uint32(2) << bit) - jnp.uint32(1)  # wraps to all-ones at 31
    w = _WORD_IOTA16[None, :]
    return jnp.where(
        w < word_idx,
        jnp.uint32(0xFFFFFFFF),
        jnp.where(w == word_idx, low, jnp.uint32(0)),
    )


def ngram_step_pair32(table32, cn, n, start, end, letter_list, bad):
    n_words, _, n_planes, ms_offset, _ = _geometry_pair(n)
    ms_word = ms_offset // 4
    v = _word_value(letter_list)
    cn_sel = jnp.zeros(v.shape, dtype=jnp.uint32)
    for j in range(n_words):
        cn_sel = cn_sel + jnp.where(v == j, cn[j], jnp.uint32(0))
    pos_s = start - jnp.uint32(1)
    base = (pos_s >> jnp.uint32(8)).astype(jnp.int32)
    local_s = (pos_s & jnp.uint32(0xFF)).astype(jnp.int32)
    local_e = (end - (pos_s & ~jnp.uint32(0xFF))).astype(jnp.int32)
    overflow = local_e >= 512
    local_e = jnp.minimum(local_e, 511)

    rows32 = table32[base]
    match = _pair_match32(rows32, v, n_planes)
    occ_s = jnp.sum(
        lax.population_count(match & _pair_mask32(local_s)),
        axis=1, dtype=jnp.int32,
    )
    occ_e = jnp.sum(
        lax.population_count(match & _pair_mask32(local_e)),
        axis=1, dtype=jnp.int32,
    )
    ms_all = rows32[:, ms_word : ms_word + n_words]
    ms = jnp.zeros(v.shape, dtype=jnp.uint32)
    for j in range(n_words):
        ms = ms + jnp.where(v == j, ms_all[:, j], jnp.uint32(0))
    new_start = cn_sel + ms + occ_s.astype(jnp.uint32)
    new_end = cn_sel + ms + occ_e.astype(jnp.uint32) - jnp.uint32(1)
    keep = start <= end
    bad = bad | (overflow & keep)
    return (
        jnp.where(keep, new_start, start),
        jnp.where(keep, new_end, end),
        bad,
    )


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
    n_words, _, n_planes, ms_offset, row_bytes = _geometry_pair(2)
    # u32 view of the same table (host bitcast, little-endian)
    tab_host = np.asarray(dig.packed)
    tab32 = jax.block_until_ready(
        jnp.asarray(tab_host.view("<u4").reshape(tab_host.shape[0], -1))
    )
    log(f"tables ready: u8 {tab_host.shape} u32 {tab32.shape}")

    starts = rng.integers(0, NUM_BASES - KMER_LEN, size=Q)
    windows = np.lib.stride_tricks.sliding_window_view(seq, KMER_LEN)
    mat = jax.block_until_ready(
        jnp.asarray(alpha.NT_ASCII_TO_INDEX[windows[starts]])
    )

    m = KMER_LEN - SEED_K
    groups = [[m - 2 * (t + 1) + j for j in range(2)] for t in range(m // 2)]
    tail = list(range(m % 2 - 1, -1, -1))

    @jax.jit
    def count_u8(dev, dig, mat):
        start, end = S._seed_lookup(dev, mat[:, KMER_LEN - SEED_K : KMER_LEN])
        bad = jnp.zeros(mat.shape[0], dtype=bool)
        for g in groups:
            letters = [mat[:, c].astype(jnp.int32) for c in g]
            start, end, bad = ngram_ops.ngram_backward_step_pair(
                dig, start, end, letters, bad
            )
        for c in tail:
            start, end, bad = S.rank_ops.backward_step_pair(
                dev, start, end, mat[:, c].astype(jnp.int32), bad
            )
        return start, end, bad

    @jax.jit
    def count_u32tab(dev, dig, tab32, mat):
        start, end = S._seed_lookup(dev, mat[:, KMER_LEN - SEED_K : KMER_LEN])
        bad = jnp.zeros(mat.shape[0], dtype=bool)
        for g in groups:
            letters = [mat[:, c].astype(jnp.int32) for c in g]
            start, end, bad = ngram_step_pair32(
                tab32, dig.cn, 2, start, end, letters, bad
            )
        for c in tail:
            start, end, bad = S.rank_ops.backward_step_pair(
                dev, start, end, mat[:, c].astype(jnp.int32), bad
            )
        return start, end, bad

    @jax.jit
    def count_u8cast(dev, dig, mat):
        start, end = S._seed_lookup(dev, mat[:, KMER_LEN - SEED_K : KMER_LEN])
        bad = jnp.zeros(mat.shape[0], dtype=bool)

        def step32_from_u8(start, end, letters, bad):
            v = _word_value(letters)
            pos_s = start - jnp.uint32(1)
            base = (pos_s >> jnp.uint32(8)).astype(jnp.int32)
            rows8 = dig.packed[base]
            rows32 = lax.bitcast_convert_type(
                rows8.reshape(rows8.shape[0], -1, 4), jnp.uint32
            )
            local_s = (pos_s & jnp.uint32(0xFF)).astype(jnp.int32)
            local_e = (end - (pos_s & ~jnp.uint32(0xFF))).astype(jnp.int32)
            overflow = local_e >= 512
            local_e = jnp.minimum(local_e, 511)
            match = _pair_match32(rows32, v, n_planes)
            occ_s = jnp.sum(
                lax.population_count(match & _pair_mask32(local_s)),
                axis=1, dtype=jnp.int32,
            )
            occ_e = jnp.sum(
                lax.population_count(match & _pair_mask32(local_e)),
                axis=1, dtype=jnp.int32,
            )
            ms_all = rows32[:, ms_offset // 4 : ms_offset // 4 + n_words]
            ms = jnp.zeros(v.shape, dtype=jnp.uint32)
            for j in range(n_words):
                ms = ms + jnp.where(v == j, ms_all[:, j], jnp.uint32(0))
            cn_sel = jnp.zeros(v.shape, dtype=jnp.uint32)
            for j in range(n_words):
                cn_sel = cn_sel + jnp.where(v == j, dig.cn[j], jnp.uint32(0))
            new_start = cn_sel + ms + occ_s.astype(jnp.uint32)
            new_end = cn_sel + ms + occ_e.astype(jnp.uint32) - jnp.uint32(1)
            keep = start <= end
            bad = bad | (overflow & keep)
            return (
                jnp.where(keep, new_start, start),
                jnp.where(keep, new_end, end),
                bad,
            )

        for g in groups:
            letters = [mat[:, c].astype(jnp.int32) for c in g]
            start, end, bad = step32_from_u8(start, end, letters, bad)
        for c in tail:
            start, end, bad = S.rank_ops.backward_step_pair(
                dev, start, end, mat[:, c].astype(jnp.int32), bad
            )
        return start, end, bad

    # verify bit-identical results
    s8, e8, b8 = [np.asarray(x) for x in count_u8(dev, dig, mat)]
    s32, e32, b32 = [np.asarray(x) for x in count_u32tab(dev, dig, tab32, mat)]
    sc, ec, bc = [np.asarray(x) for x in count_u8cast(dev, dig, mat)]
    assert (s8 == s32).all() and (e8 == e32).all() and (b8 == b32).all()
    assert (s8 == sc).all() and (e8 == ec).all() and (b8 == bc).all()
    log("all variants bit-identical")

    def run(fn, *args):
        s, e, _ = fn(*args, mat)
        _ = int(np.asarray(s[0])) + int(np.asarray(e[0]))

    interleave(
        [
            ("u8", lambda: run(count_u8, dev, dig)),
            ("u32tab", lambda: run(count_u32tab, dev, dig, tab32)),
            ("u8cast", lambda: run(count_u8cast, dev, dig)),
        ]
    )

    # ---- backtrace LF step: u8 vs bitcast-u32 math ----------------------
    pos0 = jax.block_until_ready(
        jnp.asarray(
            rng.integers(0, index.bwt_length, size=Q, dtype=np.uint32)
        )
    )

    @jax.jit
    def lf_u8(dev, p):
        for _ in range(8):
            _, p = S.rank_ops.letter_and_lf_at(dev, p)
        return p

    v2i = np.asarray(
        alpha.vector_to_index_lut(AlphabetType.DNA).astype(np.int32)
    )
    lut8 = np.asarray(alpha.index_to_vector_lut(AlphabetType.DNA))
    _IOTA8 = np.arange(8, dtype=np.int32)

    @jax.jit
    def lf_u32(dev, p):
        card = dev.cardinality
        for _ in range(8):
            blk = (p // 256).astype(jnp.int32)
            local = (p % 256).astype(jnp.int32)
            rows8 = dev.packed[blk]
            rows32 = lax.bitcast_convert_type(
                rows8.reshape(rows8.shape[0], -1, 4), jnp.uint32
            )
            word_idx = (local >> 5)[:, None]
            bit = (local & 31)[:, None].astype(jnp.uint32)
            onehot = jnp.where(
                _IOTA8[None, :] == word_idx, jnp.uint32(1) << bit, jnp.uint32(0)
            )
            code = jnp.zeros(p.shape, dtype=jnp.int32)
            for i in range(dev.n_planes):
                hit = jnp.sum(
                    lax.population_count(
                        rows32[:, i * 8 : (i + 1) * 8] & onehot
                    ),
                    axis=1, dtype=jnp.int32,
                )
                code = code | (hit << i)
            lett = jnp.zeros(p.shape, dtype=jnp.int32)
            for vv in range(1 << dev.n_planes):
                if v2i[vv]:
                    lett = lett + jnp.where(
                        code == vv, jnp.int32(v2i[vv]), jnp.int32(0)
                    )
            is_sent = lett == dev.sentinel
            lclip = jnp.minimum(lett, card)
            # match + inclusive mask in u32
            diff = None
            for i in range(dev.n_planes):
                mbit = jnp.zeros(p.shape, dtype=jnp.uint32)
                for j in range(card + 1):
                    if (lut8[j] >> i) & 1:
                        mbit = mbit | jnp.where(
                            lclip == j, jnp.uint32(0xFFFFFFFF), jnp.uint32(0)
                        )
                x = rows32[:, i * 8 : (i + 1) * 8] ^ mbit[:, None]
                diff = x if diff is None else (diff | x)
            match = ~diff
            low = (jnp.uint32(2) << bit) - jnp.uint32(1)
            w = _IOTA8[None, :]
            incl = jnp.where(
                w < word_idx,
                jnp.uint32(0xFFFFFFFF),
                jnp.where(w == word_idx, low, jnp.uint32(0)),
            )
            cnt = jnp.sum(
                lax.population_count(match & incl), axis=1, dtype=jnp.int32
            )
            ms_all = rows32[:, 24 : 24 + card + 1]
            ms = jnp.zeros(p.shape, dtype=jnp.uint32)
            for j in range(card + 1):
                ms = ms + jnp.where(lclip == j, ms_all[:, j], jnp.uint32(0))
            occ = ms + cnt.astype(jnp.uint32)
            ps = jnp.zeros(p.shape, dtype=jnp.uint32)
            for j in range(card + 2):
                ps = ps + jnp.where(
                    lclip == j, dev.prefix_sums[j], jnp.uint32(0)
                )
            lf = ps + occ - jnp.uint32(1)
            p = jnp.where(is_sent, jnp.uint32(0), lf)
        return p

    a = np.asarray(lf_u8(dev, pos0))
    b = np.asarray(lf_u32(dev, pos0))
    assert (a == b).all(), "LF variants disagree"
    log("LF variants bit-identical")

    def run_lf(fn):
        _ = int(np.asarray(fn(dev, pos0)[0]))

    interleave(
        [("lf_u8", lambda: run_lf(lf_u8)), ("lf_u32", lambda: run_lf(lf_u32))]
    )

    log("done")


if __name__ == "__main__":
    main()
