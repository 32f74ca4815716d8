"""Multi-sequence index tests (model: test/multiSequenceIndexTest).

The reference verifies: FastaVector-built index == raw-sequence index,
global->local positions for ALL positions, and header recall.
"""

import numpy as np
import pytest

from avxwindowfmindex_tpu import (
    AlphabetType,
    IndexConfiguration,
    SearchEngine,
    create_index,
    create_index_from_fasta,
)

from oracle import random_kmer, random_sequence


def _write_fasta(path, records):
    with open(path, "w") as fh:
        for name, seq in records:
            fh.write(f">{name}\n")
            for i in range(0, len(seq), 60):
                fh.write(seq[i : i + 60].decode() + "\n")


@pytest.fixture
def fasta_index(rng, tmp_path):
    records = [
        (f"sequence_{i} description {i}", random_sequence(rng, int(rng.integers(50, 400)), AlphabetType.DNA))
        for i in range(5)
    ]
    path = tmp_path / "multi.fasta"
    _write_fasta(path, records)
    cfg = IndexConfiguration(4, 3, AlphabetType.DNA)
    return records, create_index_from_fasta(str(path), cfg)


def test_fasta_index_equals_raw_index(rng, fasta_index):
    # multiSequenceIndexTest: fasta-built == index built from the
    # concatenated raw sequence
    records, fasta_idx = fasta_index
    concat = b"".join(seq for _, seq in records)
    raw_idx = create_index(concat, IndexConfiguration(4, 3, AlphabetType.DNA))
    np.testing.assert_array_equal(fasta_idx.bwt_letters, raw_idx.bwt_letters)
    np.testing.assert_array_equal(fasta_idx.prefix_sums, raw_idx.prefix_sums)
    np.testing.assert_array_equal(fasta_idx.sampled_sa, raw_idx.sampled_sa)
    np.testing.assert_array_equal(
        fasta_idx.kmer_seed_table, raw_idx.kmer_seed_table
    )
    kmers = [random_kmer(rng, 5, AlphabetType.DNA) for _ in range(50)]
    np.testing.assert_array_equal(
        SearchEngine(fasta_idx).count(kmers), SearchEngine(raw_idx).count(kmers)
    )


def test_global_to_local_for_all_positions(fasta_index):
    # the reference checks EVERY global position (:33-44)
    records, index = fasta_index
    lengths = [len(seq) for _, seq in records]
    expected = []
    for seq_num, L in enumerate(lengths):
        for local in range(L):
            expected.append((seq_num, local))
    total = sum(lengths)
    got_seq, got_local = index.get_local_sequence_position(np.arange(total))
    want = np.array(expected)
    np.testing.assert_array_equal(got_seq, want[:, 0])
    np.testing.assert_array_equal(got_local, want[:, 1])


def test_header_recall(fasta_index):
    records, index = fasta_index
    assert index.num_sequences() == len(records)
    for i, (name, _) in enumerate(records):
        assert index.get_header(i).decode() == name


def test_located_hits_map_to_correct_sequences(rng, fasta_index):
    records, index = fasta_index
    engine = SearchEngine(index)
    # take a kmer from inside record 2 and confirm mapping
    name2, seq2 = records[2]
    if len(seq2) >= 20:
        kmer = seq2[5:17]
        hits = engine.locate([kmer])[0]
        offset = sum(len(s) for _, s in records[:2])
        assert (offset + 5) in hits.tolist()
        seqn, local = index.get_local_sequence_position(offset + 5)
        assert (int(seqn), int(local)) == (2, 5)
