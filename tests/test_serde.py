"""`.awfmi` serialization tests (models: fileTests, inMemorySaTest)."""

import numpy as np
import pytest

from avxwindowfmindex_tpu import (
    AlphabetType,
    IndexConfiguration,
    SearchEngine,
    create_index,
    create_index_from_fasta,
    read_index_from_file,
)
from avxwindowfmindex_tpu.io import awfmi

from oracle import match_positions, random_kmer, random_sequence


def _cfg(alphabet, k=3, ratio=4, **kw):
    return IndexConfiguration(
        suffix_array_compression_ratio=ratio,
        kmer_length_in_seed_table=k,
        alphabet_type=alphabet,
        **kw,
    )


@pytest.mark.parametrize("alphabet", [AlphabetType.DNA, AlphabetType.AMINO])
def test_write_read_roundtrip(rng, tmp_path, alphabet):
    seq = random_sequence(rng, 900, alphabet)
    path = str(tmp_path / "t.awfmi")
    index = create_index(seq, _cfg(alphabet), file_src=path)
    loaded = read_index_from_file(path)

    assert loaded.bwt_length == index.bwt_length
    assert loaded.version_number == 8
    assert loaded.config.alphabet_type == alphabet
    np.testing.assert_array_equal(loaded.bwt_letters, index.bwt_letters)
    np.testing.assert_array_equal(loaded.prefix_sums, index.prefix_sums)
    np.testing.assert_array_equal(loaded.kmer_seed_table, index.kmer_seed_table)
    np.testing.assert_array_equal(loaded.sampled_sa, index.sampled_sa)
    assert loaded.sequence == index.sequence


def test_file_header_bytes(rng, tmp_path):
    # AwFmFile.c:17-18, 48-103 — exact header layout
    path = str(tmp_path / "t.awfmi")
    create_index(b"ACGTACGTAC", _cfg(AlphabetType.DNA, k=2, ratio=2), file_src=path)
    raw = open(path, "rb").read()
    assert raw[:10] == b"AwFmIndex\n"
    assert int.from_bytes(raw[10:14], "little") == 8  # version
    assert int.from_bytes(raw[14:18], "little") == 0  # no fastaVector flag
    assert raw[18] == 2 and raw[19] == 2  # ratio, k
    assert raw[20] == int(AlphabetType.DNA)
    assert raw[21] == 1  # storeOriginalSequence
    assert int.from_bytes(raw[22:30], "little") == 11  # bwtLength
    # nucleotide block = 160 bytes (AwFmIndex.h:61-65)
    block_start = 30
    seq_off = awfmi.sequence_file_offset(read_index_from_file(path))
    assert seq_off == block_start + 160 + 6 * 8 + (4**2) * 16


def test_sequence_read_from_file(rng, tmp_path):
    # fileTests: awFmReadSequenceFromFile recall vs original
    seq = random_sequence(rng, 500, AlphabetType.DNA)
    path = str(tmp_path / "t.awfmi")
    index = create_index(seq, _cfg(AlphabetType.DNA), file_src=path)
    assert awfmi.read_sequence_from_file(index, 0, 50) == seq[:50]
    assert awfmi.read_sequence_from_file(index, 123, 77) == seq[123:200]
    with pytest.raises(IndexError):
        awfmi.read_sequence_from_file(index, 499, 10)


def test_sa_values_from_file_match_memory(rng, tmp_path):
    seq = random_sequence(rng, 700, AlphabetType.DNA)
    path = str(tmp_path / "t.awfmi")
    index = create_index(seq, _cfg(AlphabetType.DNA, ratio=3), file_src=path)
    for i in range(len(index.sampled_sa)):
        assert awfmi.get_suffix_array_value_from_file(index, i) == index.sampled_sa[i]


@pytest.mark.parametrize("alphabet", [AlphabetType.DNA, AlphabetType.AMINO])
def test_on_disk_sa_locate_matches_in_memory(rng, tmp_path, alphabet):
    # inMemorySaTest parity: on-disk SA path == in-memory SA path
    seq = random_sequence(rng, 800, alphabet)
    path = str(tmp_path / "t.awfmi")
    create_index(seq, _cfg(alphabet, ratio=5), file_src=path)
    mem = SearchEngine(read_index_from_file(path, keep_suffix_array_in_memory=True))
    disk = SearchEngine(read_index_from_file(path, keep_suffix_array_in_memory=False))
    kmers = [random_kmer(rng, int(rng.integers(1, 7)), alphabet) for _ in range(20)]
    hits_mem = mem.locate(kmers)
    hits_disk = disk.locate(kmers)
    for kmer, a, b in zip(kmers, hits_mem, hits_disk):
        np.testing.assert_array_equal(a, b, err_msg=repr(kmer))
        np.testing.assert_array_equal(
            np.sort(a.astype(np.int64)), match_positions(seq, kmer, alphabet)
        )


def test_fasta_roundtrip_with_metadata(rng, tmp_path):
    fasta = tmp_path / "multi.fasta"
    fasta.write_text(
        ">seq one header\nGATTACAGATTACA\nACGT\n>seq two\nTTTTGATTACATTTT\n"
    )
    path = str(tmp_path / "t.awfmi")
    index = create_index_from_fasta(str(fasta), _cfg(AlphabetType.DNA), path)
    loaded = read_index_from_file(path)
    assert loaded.contains_fasta_vector
    assert loaded.num_sequences() == 2
    assert loaded.get_header(0) == b"seq one header"
    assert loaded.get_header(1) == b"seq two"
    # global -> local mapping across the boundary (18 = len of seq one)
    seqn, local = loaded.get_local_sequence_position(17)
    assert (int(seqn), int(local)) == (0, 17)
    seqn, local = loaded.get_local_sequence_position(18)
    assert (int(seqn), int(local)) == (1, 0)


def test_store_original_sequence_false(rng, tmp_path):
    seq = random_sequence(rng, 300, AlphabetType.DNA)
    path = str(tmp_path / "t.awfmi")
    index = create_index(
        seq, _cfg(AlphabetType.DNA, store_original_sequence=False), file_src=path
    )
    loaded = read_index_from_file(path)
    assert loaded.sequence is None
    with pytest.raises(ValueError):
        awfmi.read_sequence_from_file(loaded, 0, 10)
    # search still works
    eng = SearchEngine(loaded)
    assert eng.count([seq[10:16]])[0] >= 1


def test_truncated_file_errors_cleanly(rng, tmp_path):
    seq = random_sequence(rng, 300, AlphabetType.DNA)
    path = str(tmp_path / "t.awfmi")
    create_index(seq, _cfg(AlphabetType.DNA), file_src=path)
    raw = open(path, "rb").read()
    for cut in (5, 12, 25, len(raw) // 2):
        trunc = str(tmp_path / f"cut{cut}.awfmi")
        open(trunc, "wb").write(raw[:cut])
        with pytest.raises((ValueError, IndexError)):
            read_index_from_file(trunc)


def test_wrong_version_rejected(rng, tmp_path):
    seq = random_sequence(rng, 200, AlphabetType.DNA)
    path = str(tmp_path / "t.awfmi")
    create_index(seq, _cfg(AlphabetType.DNA), file_src=path)
    raw = bytearray(open(path, "rb").read())
    raw[10] = 7  # version 7
    bad = str(tmp_path / "v7.awfmi")
    open(bad, "wb").write(bytes(raw))
    with pytest.raises(ValueError, match="version"):
        read_index_from_file(bad)
