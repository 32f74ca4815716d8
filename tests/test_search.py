"""Search correctness vs brute force (model: test/searchTest/searchTest.c).

Random indices x random kmers; counts and BWT ranges verified against a
naive position scan over the sanitized sequence.
"""

import numpy as np
import pytest

from avxwindowfmindex_tpu import (
    AlphabetType,
    IndexConfiguration,
    SearchEngine,
    create_index,
    find_search_range_for_string,
    single_kmer_exists,
)

from oracle import count_occurrences, random_kmer, random_sequence


def _cfg(alphabet, k=3, ratio=4):
    return IndexConfiguration(
        suffix_array_compression_ratio=ratio,
        kmer_length_in_seed_table=k,
        alphabet_type=alphabet,
    )


@pytest.mark.parametrize("alphabet", [AlphabetType.DNA, AlphabetType.AMINO])
def test_count_vs_bruteforce_random(rng, alphabet):
    for trial in range(5):
        n = int(rng.integers(50, 2500))
        seq = random_sequence(rng, n, alphabet)
        index = create_index(seq, _cfg(alphabet))
        engine = SearchEngine(index)
        kmers = [
            random_kmer(rng, int(rng.integers(1, 11)), alphabet)
            for _ in range(200)
        ]
        counts = engine.count(kmers)
        for kmer, got in zip(kmers, counts):
            want = count_occurrences(seq, kmer, alphabet)
            assert got == want, (kmer, got, want)


def test_count_with_ambiguous_kmers(rng):
    # kmers containing the ambiguity char are seed-table-ineligible and go
    # through the unseeded path (AwFmParallelSearch.c:240-258); 'x' in the
    # query matches sanitized ambiguity positions in the database.
    alphabet = AlphabetType.DNA
    seq = b"ACGTNNACGTNACGTACGNT" * 10
    index = create_index(seq, _cfg(alphabet))
    engine = SearchEngine(index)
    kmers = [b"xx", b"ACGx", b"xACGT", b"Nx", b"GxT"]
    counts = engine.count(kmers)
    for kmer, got in zip(kmers, counts):
        assert got == count_occurrences(seq, kmer, alphabet), kmer


def test_short_kmers_skip_seed_table(rng):
    # kmers shorter than k search only their own length
    # (AwFmParallelSearch.c:240-248)
    alphabet = AlphabetType.DNA
    seq = random_sequence(rng, 800, alphabet)
    index = create_index(seq, _cfg(alphabet, k=5))
    engine = SearchEngine(index)
    kmers = [b"A", b"CG", b"GAT", b"TTTT"]
    counts = engine.count(kmers)
    for kmer, got in zip(kmers, counts):
        assert got == count_occurrences(seq, kmer, alphabet), kmer


def test_mixed_eligible_ineligible_batch(rng):
    alphabet = AlphabetType.DNA
    seq = random_sequence(rng, 1500, alphabet)
    index = create_index(seq, _cfg(alphabet, k=4))
    engine = SearchEngine(index)
    kmers = [b"ACGT", b"AC", b"ACGNT", b"TTTTTTT", b"x", b"GATTACA"]
    counts = engine.count(kmers)
    for kmer, got in zip(kmers, counts):
        assert got == count_occurrences(seq, kmer, alphabet), kmer


def test_single_query_api(rng):
    alphabet = AlphabetType.DNA
    seq = b"GATTACAGATTACAGGGATTACA"
    index = create_index(seq, _cfg(alphabet, k=2))
    start, end = find_search_range_for_string(index, "GATTACA")
    assert end - start + 1 == 3
    assert single_kmer_exists(index, "GATTACA")
    assert not single_kmer_exists(index, "GATTACC")


def test_kmer_longer_than_sequence(rng):
    seq = b"ACGT"
    index = create_index(seq, _cfg(AlphabetType.DNA, k=2))
    engine = SearchEngine(index)
    assert engine.count([b"ACGTACGTACGT"])[0] == 0


def test_case_insensitive_queries(rng):
    seq = b"GattacaGATTACA"
    index = create_index(seq, _cfg(AlphabetType.DNA, k=2))
    engine = SearchEngine(index)
    assert engine.count([b"gattaca"])[0] == 2
    assert engine.count([b"GATTACA"])[0] == 2


def test_rna_u_matches_t(rng):
    seq = b"ACGTACGT"
    index = create_index(seq, _cfg(AlphabetType.DNA, k=2))
    engine = SearchEngine(index)
    assert engine.count([b"ACGU"])[0] == 2


def test_single_range_locate_parity(rng):
    from avxwindowfmindex_tpu import (
        find_database_hit_position_single,
        find_database_hit_positions,
    )

    alphabet = AlphabetType.DNA
    seq = random_sequence(rng, 500, alphabet)
    index = create_index(seq, _cfg(alphabet))
    engine = SearchEngine(index)
    kmer = seq[100:104]
    s, e = find_search_range_for_string(index, kmer)
    hits = find_database_hit_positions(index, s, e)
    want = engine.locate([kmer])[0]
    np.testing.assert_array_equal(hits, want)
    assert find_database_hit_position_single(index, s) == hits[0]
    # invalid range -> empty (AwFmGeneralFailure analogue)
    assert len(find_database_hit_positions(index, 5, 4)) == 0


def test_backtrace_previous_letter(rng):
    from avxwindowfmindex_tpu import backtrace_return_previous_letter_index

    seq = b"GATTACA"
    index = create_index(seq, _cfg(AlphabetType.DNA, k=2, ratio=1))
    # walk LF from some position; every returned letter must be a valid index
    pos = 3
    for _ in range(5):
        lett, pos = backtrace_return_previous_letter_index(index, pos)
        assert 0 <= lett <= 4
    # sentinel early-out: letter 0, position UNCHANGED (the reference
    # returns before writing *bwtPosition, AwFmSearch.c:443-445)
    sent_pos = int(np.flatnonzero(index.bwt_letters == index.sentinel_index)[0])
    lett, pos = backtrace_return_previous_letter_index(index, sent_pos)
    assert lett == 0 and pos == sent_pos


def test_iterative_step_matches_full_search(rng):
    from avxwindowfmindex_tpu import (
        create_initial_query_range,
        iterative_step_backward_search,
        search_range_is_valid,
    )
    from avxwindowfmindex_tpu.models import alphabet as al

    seq = random_sequence(rng, 600, AlphabetType.DNA)
    index = create_index(seq, _cfg(AlphabetType.DNA))
    kmer = seq[50:57]
    lett = al.ascii_to_index(np.frombuffer(kmer, np.uint8), AlphabetType.DNA)
    # manual letter-by-letter loop (the reference's documented usage)
    s, e = create_initial_query_range(index, kmer)
    for j in range(len(lett) - 2, -1, -1):
        if not search_range_is_valid(s, e):
            break
        s, e = iterative_step_backward_search(index, s, e, int(lett[j]))
    want_s, want_e = find_search_range_for_string(index, kmer)
    assert (s, e) == (want_s, want_e)
