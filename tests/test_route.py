"""Slab-routed gather (ops/route.py): parity with the mono formulations.

The routed path is a pure speed formulation of the same math — every
test here asserts BIT-identical results against AWFM_ROUTE=0, including
the clustered-batch overflow fallback (reference behavior anchor: the
block fetch of AwFmOccurrence.c:52-135 has no ordering semantics, so a
sort-and-restore reformulation must be observationally invisible).
"""

import os

import numpy as np
import pytest

import avxwindowfmindex_tpu as awfm
from avxwindowfmindex_tpu import search as S
from avxwindowfmindex_tpu.ops import ngram as ngram_ops
from avxwindowfmindex_tpu.ops import route as route_ops


TINY_SLAB = "16384"  # 128 rows/slab on 128 B rows: many slabs on toy tables


@pytest.fixture
def routed_env(monkeypatch):
    monkeypatch.setenv("AWFM_ROUTE", "1")
    monkeypatch.setenv("AWFM_ROUTE_SLAB_BYTES", TINY_SLAB)


@pytest.fixture(scope="module")
def dna_index():
    rng = np.random.default_rng(0xB0)
    seq = rng.choice(np.frombuffer(b"acgt", np.uint8), size=120_000).tobytes()
    cfg = awfm.IndexConfiguration(
        suffix_array_compression_ratio=8,
        kmer_length_in_seed_table=6,
        alphabet_type=awfm.AlphabetType.DNA,
    )
    return awfm.create_index(seq, cfg), seq


def _sample_kmers(seq, n, k, seed=7):
    rng = np.random.default_rng(seed)
    arr = np.frombuffer(seq, np.uint8)
    starts = rng.integers(0, len(seq) - k, size=n)
    return [arr[s : s + k].tobytes() for s in starts]


def test_plan_policy():
    # off below the cliff / tiny batches in auto mode
    assert route_ops.plan_for(1 << 20, 128, 1 << 22) is None  # 128 MiB
    big = (2 << 30) // 128
    assert route_ops.plan_for(big, 128, 1024) is None  # batch too small
    p = route_ops.plan_for(big, 128, 1 << 22)
    assert p is not None
    assert p.sr * 128 <= (48 << 20)
    assert p.k == -(-big // p.sr)
    assert p.cap >= (1 << 22) // p.k
    # forced mode routes toy tables but never a single slab
    os.environ["AWFM_ROUTE"] = "1"
    try:
        assert route_ops.plan_for(100, 128, 512) is None  # fits one slab
        os.environ["AWFM_ROUTE_SLAB_BYTES"] = TINY_SLAB
        assert route_ops.plan_for(1000, 128, 512) is not None
    finally:
        os.environ.pop("AWFM_ROUTE")
        os.environ.pop("AWFM_ROUTE_SLAB_BYTES")
    assert route_ops.plan_for(1000, 128, 512) is None


def test_routed_engines_match_mono(dna_index, routed_env, monkeypatch):
    idx, seq = dna_index
    kmers = _sample_kmers(seq, 300, 21)
    monkeypatch.setenv("AWFM_ROUTE", "0")
    base = S.NgramSearchEngine(idx)
    c0 = list(base.count(kmers))
    l0 = [sorted(h.tolist()) for h in base.locate(kmers)]
    monkeypatch.setenv("AWFM_ROUTE", "1")
    routed = S.NgramSearchEngine(idx)
    assert list(routed.count(kmers)) == c0
    assert [sorted(h.tolist()) for h in routed.locate(kmers)] == l0
    single = S.SearchEngine(idx)
    assert list(single.count(kmers)) == c0
    assert [sorted(h.tolist()) for h in single.locate(kmers)] == l0


def test_routed_steploop_parity(dna_index, routed_env, monkeypatch):
    idx, seq = dna_index
    dev = idx.to_device()
    ng = ngram_ops.build_ngram_device(idx, 2)
    eng = S.SearchEngine(idx)
    mat, _, _ = eng.encode_kmers(_sample_kmers(seq, 256, 20))
    mat = mat[:, :20]
    monkeypatch.setenv("AWFM_ROUTE", "0")
    s0, e0 = S._ngram_ranges_steploop(dev, ng, mat, kmer_len=20, seed_k=6)
    monkeypatch.setenv("AWFM_ROUTE", "1")
    s1, e1 = S._ngram_ranges_steploop(dev, ng, mat, kmer_len=20, seed_k=6)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(e1))


def test_routed_overflow_fallback(dna_index, routed_env, monkeypatch):
    """A batch of identical kmers makes one slab run exceed the static
    cap; the uncovered rows must flow into the exact redo nets (digram
    bad-fixup; backtrace while_loop net) and keep results exact."""
    idx, seq = dna_index
    dev = idx.to_device()
    ng = ngram_ops.build_ngram_device(idx, 2)
    eng = S.SearchEngine(idx)
    kmers = [_sample_kmers(seq, 1, 20)[0]] * 256
    mat, _, _ = eng.encode_kmers(kmers)
    mat = mat[:, :20]
    monkeypatch.setenv("AWFM_ROUTE", "0")
    s0, e0 = S._ngram_ranges_steploop(dev, ng, mat, kmer_len=20, seed_k=6)
    monkeypatch.setenv("AWFM_ROUTE", "1")
    s1, e1 = S._ngram_ranges_steploop(dev, ng, mat, kmer_len=20, seed_k=6)
    np.testing.assert_array_equal(np.asarray(s0), np.asarray(s1))
    np.testing.assert_array_equal(np.asarray(e0), np.asarray(e1))
    # identical-kmer locate drives the same clustered positions through
    # the routed backtrace
    monkeypatch.setenv("AWFM_ROUTE", "0")
    l0 = [sorted(h.tolist()) for h in S.SearchEngine(idx).locate(kmers)]
    monkeypatch.setenv("AWFM_ROUTE", "1")
    l1 = [sorted(h.tolist()) for h in S.SearchEngine(idx).locate(kmers)]
    assert l0 == l1


def test_routed_backtrace_clustered_overflow_net(dna_index, routed_env,
                                                 monkeypatch):
    """All positions in ONE block with a cap-overflowing plan: every
    routed window overflows, no row advances in the routed segments,
    and backtrace_all's exactness net must still produce the mono
    answer."""
    import jax.numpy as jnp

    idx, _ = dna_index
    dev = idx.to_device()
    rng = np.random.default_rng(13)
    base = 5 * 256
    pos = jnp.asarray(
        rng.integers(base, base + 256, size=1024, dtype=np.uint32)
    )
    monkeypatch.setenv("AWFM_ROUTE", "0")
    p0, o0 = S.backtrace_all(dev, pos)
    monkeypatch.setenv("AWFM_ROUTE", "1")
    p1, o1 = S.backtrace_all(dev, pos)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))


def test_routed_backtrace_sliced_bigbatch(dna_index, routed_env):
    """When bits(batch) + off_bits exceed the u32 pack, the batch is
    routed in max-size slices (multihit-locate shape). Simulate with a
    huge prior_steps so max_b shrinks to a testable size."""
    import jax.numpy as jnp

    idx, _ = dna_index
    dev = idx.to_device()
    rng = np.random.default_rng(17)
    pos = jnp.asarray(
        rng.integers(0, idx.bwt_length, size=2048, dtype=np.uint32)
    )
    off = jnp.zeros_like(pos)
    p0, o0 = S._backtrace_steps_any(dev, pos, off, 6, prior_steps=0)
    # prior bound 2^22 -> off_bits 23 -> max_b = 512: forces 4 slices
    p1, o1 = S._backtrace_steps_any(
        dev, pos, off, 6, prior_steps=(1 << 22) - 6
    )
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))


def test_routed_backtrace_segment_parity(dna_index, routed_env):
    """pack -> routed fused segments (state stays permuted across calls)
    -> restore == _backtrace_steps_fused, positions AND offsets."""
    import jax.numpy as jnp

    idx, _ = dna_index
    dev = idx.to_device()
    rng = np.random.default_rng(11)
    pos = jnp.asarray(
        rng.integers(0, idx.bwt_length, size=1024, dtype=np.uint32)
    )
    off = jnp.zeros_like(pos)
    p0, o0 = S._backtrace_steps_fused(dev, pos, off, seg=5)
    p0, o0 = S._backtrace_steps_fused(dev, p0, o0, seg=3)
    plan0 = route_ops.plan_for(
        dev.packed.shape[0], dev.packed.shape[1], 1024
    )
    assert plan0 is not None
    # cap = b: no slab run can overflow, so the routed walk is
    # BIT-identical to the mono one (overflowed runs legitimately lag
    # and are finished by backtrace_all's net instead)
    plan = route_ops.RoutePlan(sr=plan0.sr, k=plan0.k, cap=1024)
    off_bits = (5 + 3).bit_length()  # static total-step budget, as the
    # schedule threads via prior_steps
    p, packed = S._bt_routed_pack(pos, off, off_bits=off_bits)
    p, packed = S._backtrace_steps_fused_routed(dev, p, packed, seg=5,
                                                plan=plan)
    p, packed = S._backtrace_steps_fused_routed(dev, p, packed, seg=3,
                                                plan=plan)
    p1, o1 = S._bt_routed_restore(p, packed, off_bits=off_bits)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))


def test_routed_backtrace_pads_do_not_crowd_caps(dna_index, routed_env):
    """The round-4 hg38 production regression, in miniature: a batch
    whose majority is done-at-position-0 pads (enumerate's capacity
    padding) plus real rows concentrated in slab 0. With the old
    p-key sort the pads consumed slab 0's whole cap window and every
    real slab-0 row fell to the exactness net; the sentinel-key sort
    must keep real rows covered — asserted here by parity AND by the
    routed fused segment advancing the real rows (net-free check).
    """
    import jax.numpy as jnp

    idx, _ = dna_index
    dev = idx.to_device()
    rng = np.random.default_rng(23)
    n_real = 128
    # real rows: undone positions inside slab 0 (block ids < sr)
    plan0 = route_ops.plan_for(dev.packed.shape[0], dev.packed.shape[1],
                               1024)
    assert plan0 is not None and plan0.k >= 2
    lim = min(plan0.sr * 256, idx.bwt_length)
    real = rng.integers(1, lim, size=n_real, dtype=np.uint32)
    real = real[np.asarray(real) % 8 != 0][:64]
    pads = np.zeros(1024 - real.size, dtype=np.uint32)
    pos = jnp.asarray(np.concatenate([real, pads]))
    off = jnp.zeros_like(pos)
    # cap smaller than the pad count but bigger than the real slab-0
    # run: the old sort order overflowed, the sentinel order must not
    plan = route_ops.RoutePlan(sr=plan0.sr, k=plan0.k, cap=256)
    p0, o0 = S._backtrace_steps_fused(dev, pos, off, seg=4)
    p, packed = S._bt_routed_pack(pos, off, off_bits=3)
    p, packed = S._backtrace_steps_fused_routed(dev, p, packed, seg=4,
                                                plan=plan)
    p1, o1 = S._bt_routed_restore(p, packed, off_bits=3)
    np.testing.assert_array_equal(np.asarray(p0), np.asarray(p1))
    np.testing.assert_array_equal(np.asarray(o0), np.asarray(o1))


def test_compaction_pad_slots_are_dropped_done_sentinels(dna_index):
    """_gather_undone{,_cumsum} pad slots: position 0 (done), idx == b
    (dropped by _scatter_back) — never duplicates of row 0 (the
    round-4 routed-cap bomb when row 0 was undone)."""
    import jax.numpy as jnp

    idx_obj, _ = dna_index
    dev = idx_obj.to_device()
    assert dev.ratio == 8
    # row 0 UNDONE (p=3); only 2 undone rows, m=8 -> 6 pad slots
    p = jnp.asarray(np.array([3, 8, 16, 11, 24, 32], dtype=np.uint32))
    off = jnp.asarray(np.arange(6, dtype=np.uint32))
    for fn in (S._gather_undone, S._gather_undone_cumsum):
        idx, sub_p, sub_off = fn(dev, p, off, m=8)
        idx = np.asarray(idx)
        sub_p = np.asarray(sub_p)
        sub_off = np.asarray(sub_off)
        assert sorted(idx[idx < 6].tolist()) == [0, 3]
        assert (idx[sub_p == 0] == 6).all()  # pads: done + out of bounds
        assert (sub_p[idx == 6] == 0).all()
        assert (sub_off[idx == 6] == 0).all()
        # scatter_back drops pads: parent arrays unchanged except the
        # genuinely-updated rows
        new_p, new_off = S._scatter_back(
            p, off, jnp.asarray(idx), jnp.asarray(sub_p) + 1,
            jnp.asarray(sub_off) + 1,
        )
        np.testing.assert_array_equal(
            np.asarray(new_p)[[1, 2, 4, 5]], np.asarray(p)[[1, 2, 4, 5]]
        )
        assert np.asarray(new_p)[0] == 4 and np.asarray(new_p)[3] == 12


def test_permuted_backtrace_matches_unpermuted(dna_index, routed_env,
                                               monkeypatch):
    """The permuted sliced-compaction driver (AWFM_BT_PERMUTED, default
    on in the routed regime) must produce the exact (p, off) of the
    unpermuted compaction driver — across schedules, duplicated
    lock-step positions (statistical truncation), and batch sizes that
    do and don't create levels."""
    import jax.numpy as jnp

    index, _seq = dna_index
    dev = index.to_device()
    rng = np.random.default_rng(0xC4)

    batches = [
        jnp.asarray(
            rng.integers(0, index.bwt_length, size=16384).astype(np.uint32)
        ),
        # heavy duplication: forces truncated levels -> exactness net
        jnp.asarray(
            np.repeat(
                rng.integers(0, index.bwt_length, size=8).astype(np.uint32),
                2048,
            )
        ),
    ]
    scheds = [
        {},
        {"AWFM_BT_LEVEL_SEG": "4", "AWFM_BT_SLACK": "0"},
        {"AWFM_BT_FIRST_SEG": "2", "AWFM_BT_MIN_LEVEL": "64"},
    ]
    for pos in batches:
        for sched in scheds:
            for k, v in sched.items():
                monkeypatch.setenv(k, v)
            monkeypatch.setenv("AWFM_BT_PERMUTED", "0")
            want_p, want_off = map(np.asarray, S.backtrace_all(dev, pos))
            monkeypatch.setenv("AWFM_BT_PERMUTED", "1")
            # the permuted driver must actually engage on this batch
            assert S._try_backtrace_all_permuted(dev, pos) is not None
            got_p, got_off = map(np.asarray, S.backtrace_all(dev, pos))
            np.testing.assert_array_equal(got_p, want_p)
            np.testing.assert_array_equal(got_off, want_off)
            for k in sched:
                monkeypatch.delenv(k)


def test_permuted_backtrace_declines_gracefully(dna_index, monkeypatch):
    """Without routing (auto mode, small table) the permuted driver
    must return None and backtrace_all must fall back unchanged."""
    index, _seq = dna_index
    dev = index.to_device()
    import jax.numpy as jnp

    pos = jnp.asarray(
        np.arange(4096, dtype=np.uint32) % np.uint32(index.bwt_length)
    )
    assert S._try_backtrace_all_permuted(dev, pos) is None
    p, off = map(np.asarray, S.backtrace_all(dev, pos))
    assert (p % 8 == 0).all()
