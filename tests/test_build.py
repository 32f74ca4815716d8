"""Index construction tests (models: createTests, bwtTest)."""

import numpy as np
import pytest

from avxwindowfmindex_tpu import AlphabetType, IndexConfiguration, create_index
from avxwindowfmindex_tpu.models import alphabet as alpha

from oracle import random_sequence, sanitized_letters, suffix_array_naive


def _cfg(alphabet, k=3, ratio=4):
    return IndexConfiguration(
        suffix_array_compression_ratio=ratio,
        kmer_length_in_seed_table=k,
        alphabet_type=alphabet,
    )


@pytest.mark.parametrize("alphabet", [AlphabetType.DNA, AlphabetType.AMINO])
def test_bwt_letters_match_reference_sa(rng, alphabet):
    # bwtTest.c:31-100 — every BWT letter equals sequence[SA[i]-1]
    for _ in range(10):
        n = int(rng.integers(10, 600))
        seq = random_sequence(rng, n, alphabet)
        index = create_index(seq, _cfg(alphabet))
        sanitized = alpha.sanitize(np.frombuffer(seq, np.uint8), alphabet)
        full = bytes(sanitized) + b"$"
        sa = suffix_array_naive(full)
        assert index.bwt_length == n + 1
        sent = index.sentinel_index
        lett = sanitized_letters(seq, alphabet)
        for i in range(index.bwt_length):
            if sa[i] == 0:
                assert index.bwt_letters[i] == sent
            else:
                assert index.bwt_letters[i] == lett[sa[i] - 1]


@pytest.mark.parametrize("alphabet", [AlphabetType.DNA, AlphabetType.AMINO])
def test_prefix_sums(rng, alphabet):
    # AwFmCreate.c:338-344 — prefixSums[0]=1, sentinel in letter 0's sum,
    # last entry == bwtLength
    n = 500
    seq = random_sequence(rng, n, alphabet)
    index = create_index(seq, _cfg(alphabet))
    card = index.cardinality
    lett = sanitized_letters(seq, alphabet)
    counts = np.bincount(lett, minlength=card + 2)
    assert index.prefix_sums[0] == 1
    for i in range(1, card + 2):
        assert index.prefix_sums[i] == 1 + counts[:i].sum()
    assert index.prefix_sums[card + 1] == index.bwt_length


def test_milestones_are_block_start_counts(rng):
    seq = random_sequence(rng, 2000, AlphabetType.DNA)
    index = create_index(seq, _cfg(AlphabetType.DNA))
    ms = index.milestones()
    for blk in range(index.num_blocks):
        prefix = index.bwt_letters[: blk * 256]
        counts = np.bincount(prefix, minlength=6)
        np.testing.assert_array_equal(ms[blk], counts)


def test_sampled_sa_against_reference_sa(rng):
    # parallelSearchTest.c:84-120 — every sample equals SA[i * ratio]
    ratio = 4
    seq = random_sequence(rng, 777, AlphabetType.DNA)
    index = create_index(seq, _cfg(AlphabetType.DNA, ratio=ratio))
    sanitized = alpha.sanitize(np.frombuffer(seq, np.uint8), AlphabetType.DNA)
    sa = suffix_array_naive(bytes(sanitized) + b"$")
    np.testing.assert_array_equal(index.sampled_sa, sa[::ratio].astype(np.uint64))


def test_kmer_table_length():
    # AwFmIndexStruct.c:77-86
    idx = create_index(b"ACGTACGTACGT", _cfg(AlphabetType.DNA, k=3))
    assert idx.kmer_seed_table.shape == (4**3, 2)
    idx = create_index(b"ACDEFGHIKLMNPQRSTVWY" * 3, _cfg(AlphabetType.AMINO, k=2))
    assert idx.kmer_seed_table.shape == (20**2, 2)


def test_rna_builds_like_dna(rng):
    seq_dna = b"ACGTTGCA" * 20
    seq_rna = seq_dna.replace(b"T", b"U")
    a = create_index(seq_dna, _cfg(AlphabetType.DNA))
    b = create_index(seq_rna, _cfg(AlphabetType.RNA))
    np.testing.assert_array_equal(a.bwt_letters, b.bwt_letters)
    np.testing.assert_array_equal(a.prefix_sums, b.prefix_sums)


def test_rna_end_to_end(rng, tmp_path):
    # RNA alphabet value (3) round-trips through .awfmi and u-queries work
    from avxwindowfmindex_tpu import SearchEngine, read_index_from_file

    seq = b"ACGUACGUUAGCACGU"
    cfg = IndexConfiguration(
        suffix_array_compression_ratio=2,
        kmer_length_in_seed_table=2,
        alphabet_type=AlphabetType.RNA,
    )
    path = str(tmp_path / "rna.awfmi")
    index = create_index(seq, cfg, file_src=path)
    loaded = read_index_from_file(path)
    assert loaded.config.alphabet_type == AlphabetType.RNA
    eng = SearchEngine(loaded)
    assert eng.count([b"ACGU"])[0] == 3
    assert eng.count([b"ACGT"])[0] == 3  # t == u
    # seq[8:12] == b"UAGC"
    hits = sorted(eng.locate([b"UAGC"])[0].tolist())
    assert hits == [8]
