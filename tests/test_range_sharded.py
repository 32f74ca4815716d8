"""Range-sharded index mode: results must equal the replicated engine."""

import numpy as np
import pytest

from avxwindowfmindex_tpu import (
    AlphabetType,
    IndexConfiguration,
    SearchEngine,
    create_index,
)
from avxwindowfmindex_tpu.parallel.range_sharded import (
    RangeShardedSearchEngine,
    make_index_mesh,
)

from oracle import random_kmer, random_sequence


@pytest.fixture(scope="module")
def built():
    rng = np.random.default_rng(11)
    # >8 blocks so every shard of an 8-way mesh owns at least one
    seq = random_sequence(rng, 5000, AlphabetType.DNA)
    cfg = IndexConfiguration(
        suffix_array_compression_ratio=4,
        kmer_length_in_seed_table=3,
        alphabet_type=AlphabetType.DNA,
    )
    return seq, create_index(seq, cfg)


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_count_matches(built, rng, n_dev):
    seq, index = built
    sharded = RangeShardedSearchEngine(index, make_index_mesh(n_dev))
    single = SearchEngine(index)
    kmers = [random_kmer(rng, int(rng.integers(1, 9)), AlphabetType.DNA)
             for _ in range(80)]
    np.testing.assert_array_equal(sharded.count(kmers), single.count(kmers))


def test_sharded_locate_matches(built, rng):
    seq, index = built
    sharded = RangeShardedSearchEngine(index, make_index_mesh(4))
    single = SearchEngine(index)
    kmers = [random_kmer(rng, int(rng.integers(3, 7)), AlphabetType.DNA)
             for _ in range(30)]
    got = sharded.locate(kmers)
    want = single.locate(kmers)
    for kmer, a, b in zip(kmers, got, want):
        np.testing.assert_array_equal(a, b, err_msg=repr(kmer))


def test_sharded_amino(rng):
    seq = random_sequence(rng, 3000, AlphabetType.AMINO)
    cfg = IndexConfiguration(3, 2, AlphabetType.AMINO)
    index = create_index(seq, cfg)
    sharded = RangeShardedSearchEngine(index, make_index_mesh(8))
    single = SearchEngine(index)
    kmers = [random_kmer(rng, 4, AlphabetType.AMINO) for _ in range(40)]
    np.testing.assert_array_equal(sharded.count(kmers), single.count(kmers))


def test_on_disk_sa_rejected_clearly(rng, tmp_path):
    from avxwindowfmindex_tpu import read_index_from_file

    seq = random_sequence(rng, 600, AlphabetType.DNA)
    cfg = IndexConfiguration(4, 2, AlphabetType.DNA)
    path = str(tmp_path / "r.awfmi")
    create_index(seq, cfg, file_src=path)
    on_disk = read_index_from_file(path, keep_suffix_array_in_memory=False)
    with pytest.raises(ValueError, match="suffix array"):
        RangeShardedSearchEngine(on_disk, make_index_mesh(2))


def test_resolve_fn_cached(built):
    seq, index = built
    eng = RangeShardedSearchEngine(index, make_index_mesh(2))
    eng.locate([b"ACGT"])
    fn1 = eng._resolve_fn
    eng.locate([b"GATT"])
    assert eng._resolve_fn is fn1  # no rebuild per call


def test_sharded_backtrace_compaction_levels(rng):
    """Every BWT position at ratio 16: chains longer than the fixed
    segment force the host-driven straggler compaction levels, and the
    answers must still equal the single-device walk exactly."""
    seq = random_sequence(rng, 3000, AlphabetType.DNA)
    cfg = IndexConfiguration(16, 2, AlphabetType.DNA)
    index = create_index(seq, cfg)
    sharded = RangeShardedSearchEngine(index, make_index_mesh(2))
    single = SearchEngine(index)
    pos = np.arange(index.bwt_length, dtype=np.uint64)
    np.testing.assert_array_equal(
        sharded.resolve_positions(pos), single.resolve_positions(pos)
    )


@pytest.mark.parametrize("n_dev", [2, 8])
def test_sharded_wide_matches(built, rng, n_dev):
    """Forced-wide (hi/lo-u32) range-sharded engine: count and locate
    must equal the narrow single-device engine — the capacity pairing
    for indexes that are BOTH >= 2^32 positions and bigger than one
    chip's HBM."""
    seq, index = built
    sharded = RangeShardedSearchEngine(
        index, make_index_mesh(n_dev), wide=True
    )
    assert sharded.wide and not sharded.dev.pair_fused
    single = SearchEngine(index)
    kmers = [random_kmer(rng, int(rng.integers(2, 12)), AlphabetType.DNA)
             for _ in range(64)]
    np.testing.assert_array_equal(sharded.count(kmers), single.count(kmers))
    hits = sharded.locate(kmers[:12])
    want = single.locate(kmers[:12])
    for a, b in zip(hits, want):
        np.testing.assert_array_equal(a, b)


def test_sharded_wide_mixed_eligibility(built, rng):
    """Wide sharded engine: short (unseeded) + seeded kmers in one batch."""
    seq, index = built
    sharded = RangeShardedSearchEngine(index, make_index_mesh(4), wide=True)
    single = SearchEngine(index)
    kmers = [b"AC", b"GATTACA", b"T", b"ACGTACGTACGT", b"GG"]
    np.testing.assert_array_equal(sharded.count(kmers), single.count(kmers))


def test_sharded_wide_occurrence_hi_carry(rng):
    """psum-assembled hi/lo occurrence lanes with milestones straddling
    2^32 (nonzero hi words): exactly one shard owns each position, so
    per-lane sums need no cross-shard carries — validate the assembled
    u64 against a host oracle. (The engine-level wide tests use small
    forced-wide indexes whose hi words are all zero.)"""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from avxwindowfmindex_tpu.models import alphabet as alpha
    from avxwindowfmindex_tpu.models.index import device_code_masks
    from avxwindowfmindex_tpu.ops import rank64 as r64
    from avxwindowfmindex_tpu.parallel import range_sharded as rs

    nb, n_dev = 16, 8
    card = alpha.cardinality(AlphabetType.DNA)
    letters = rng.integers(0, card + 2, size=(nb, 256)).astype(np.uint8)
    counts = np.stack(
        [(letters == j).sum(axis=1) for j in range(card + 2)], axis=1
    ).astype(np.uint64)
    cum = np.cumsum(counts, axis=0)
    ms = np.zeros_like(cum)
    ms[1:] = cum[:-1]
    ms += np.uint64(2**32 - 100)  # counts cross 2^32 mid-table
    packed = r64.pack_device_blocks64(
        letters.reshape(-1), ms, AlphabetType.DNA, pair=False
    )
    mesh = make_index_mesh(n_dev)
    bps = nb // n_dev
    rep = lambda a: jax.device_put(jnp.asarray(a), NamedSharding(mesh, P()))
    dev = r64.DeviceIndex64(
        packed=jax.device_put(
            jnp.asarray(packed), NamedSharding(mesh, P(rs.AXIS, None))
        ),
        prefix_hi=rep(np.zeros(card + 2, np.uint32)),
        prefix_lo=rep(np.ones(card + 2, np.uint32)),
        seed_table=rep(np.zeros((1, 4), np.uint32)),
        sampled_sa=jax.device_put(
            jnp.asarray(np.zeros((nb * 256 // 8, 2), np.uint32)),
            NamedSharding(mesh, P(rs.AXIS, None)),
        ),
        code_masks=rep(device_code_masks(AlphabetType.DNA)),
        vec_to_index=rep(
            alpha.vector_to_index_lut(AlphabetType.DNA).astype(np.int32)
        ),
        bwt_length=nb * 256,
        ratio=8,
        kmer_length_in_seed_table=3,
        alphabet=AlphabetType.DNA,
        pair_fused=False,
    )

    def body(d, p_hi, p_lo, ll):
        shard_id = jax.lax.axis_index(rs.AXIS).astype(jnp.int32)
        rows, local, owned = rs._local_rows64(
            d, p_hi, p_lo, shard_id * bps, bps
        )
        occ_hi, occ_lo = r64._count_rows64(d, rows, local, ll)
        occ_hi = jax.lax.psum(jnp.where(owned, occ_hi, jnp.uint32(0)), rs.AXIS)
        occ_lo = jax.lax.psum(jnp.where(owned, occ_lo, jnp.uint32(0)), rs.AXIS)
        return jnp.stack([occ_hi, occ_lo], axis=1)

    mapped = rs._shard_map(
        body, mesh=mesh,
        in_specs=(rs._dev_specs(dev), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )
    positions = rng.integers(0, nb * 256, size=256, dtype=np.uint64)
    letts = rng.integers(0, card + 1, size=256).astype(np.int32)
    p_hi, p_lo = r64.split_u64_host(positions)
    out = np.asarray(
        jax.jit(mapped)(
            dev, jnp.asarray(p_hi), jnp.asarray(p_lo), jnp.asarray(letts)
        )
    ).astype(np.uint64)
    got = (out[:, 0] << np.uint64(32)) | out[:, 1]

    flat = letters.reshape(-1)
    want = np.empty(256, dtype=np.uint64)
    for i, (p, l) in enumerate(zip(positions, letts)):
        b = int(p // 256)
        within = np.count_nonzero(flat[b * 256 : int(p) + 1] == l)
        want[i] = ms[b, l] + np.uint64(within)
    np.testing.assert_array_equal(got, want)


def test_rs_compaction_pad_slots_are_dropped_done_sentinels():
    """_gather_undone_rs / _gather_undone64_rs pad slots: done-sentinel
    (p=0, 0 % ratio == 0) at idx == b (dropped by the caller's
    mode='drop' scatter) — never duplicates of row 0. Same contract as
    search._gather_undone (test_route.py); pinned here because a future
    slab-routed segment fn in this engine would turn row-0 duplicates
    into undone-dup cap bombs (ADVICE r4)."""
    import jax.numpy as jnp

    from avxwindowfmindex_tpu.parallel import range_sharded as rsm
    from avxwindowfmindex_tpu import search64 as r64mod  # noqa: F401
    from avxwindowfmindex_tpu.ops import rank64 as r64

    ratio = 8
    # row 0 UNDONE (p=3); rows 1/2/4/5 done; 2 undone, m=8 -> 6 pads
    p = jnp.asarray(np.array([3, 8, 16, 11, 24, 32], dtype=np.uint32))
    off = jnp.asarray(np.arange(6, dtype=np.uint32))
    idx, sub_p, sub_off = rsm._gather_undone_rs(p, off, ratio=ratio, m=8)
    idx, sub_p, sub_off = map(np.asarray, (idx, sub_p, sub_off))
    assert sorted(idx[idx < 6].tolist()) == [0, 3]
    assert (idx >= 6).sum() == 6
    assert (sub_p[idx >= 6] == 0).all()
    assert (sub_off[idx >= 6] == 0).all()
    # the caller scatters with mode='drop': untouched rows unchanged
    new_p = np.asarray(p.at[jnp.asarray(idx)].set(
        jnp.asarray(sub_p) + 1, mode="drop"))
    np.testing.assert_array_equal(new_p[[1, 2, 4, 5]],
                                  np.asarray(p)[[1, 2, 4, 5]])
    assert new_p[0] == 4 and new_p[3] == 12

    # wide (hi/lo) helper, same contract; positions straddle 2^32
    pos = np.array([3, 8, 2**32 + 7, 16, 2**33, 11], dtype=np.uint64)
    hi, lo = r64.split_u64_host(pos)
    off64 = jnp.asarray(np.arange(6, dtype=np.uint32))
    idx, s_hi, s_lo, s_off = rsm._gather_undone64_rs(
        jnp.asarray(hi), jnp.asarray(lo), off64, ratio=ratio, m=8
    )
    idx, s_hi, s_lo, s_off = map(np.asarray, (idx, s_hi, s_lo, s_off))
    # undone: 3, 2^32+7, 11 -> rows 0, 2, 5
    assert sorted(idx[idx < 6].tolist()) == [0, 2, 5]
    assert (s_hi[idx >= 6] == 0).all()
    assert (s_lo[idx >= 6] == 0).all()
    assert (s_off[idx >= 6] == 0).all()
    got = (s_hi[idx < 6].astype(np.uint64) << np.uint64(32)) | s_lo[idx < 6]
    assert sorted(got.tolist()) == [3, 11, 2**32 + 7]
