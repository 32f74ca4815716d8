"""End-to-end runs on the reference repository's own test fixtures.

Uses the FASTA fixtures the reference's test suite uses
(test/multiSequenceIndexTest/sequences.fasta, test2.fa,
test/staticLibTest/test.fa — SURVEY.md §4) and validates counts and
positions against the brute-force oracle, plus serde behavior on the
stale pre-v8 binary fixture.
"""

import os

import numpy as np
import pytest

from avxwindowfmindex_tpu import (
    AlphabetType,
    IndexConfiguration,
    SearchEngine,
    create_index_from_fasta,
    read_index_from_file,
)
from avxwindowfmindex_tpu.io import fasta as fasta_mod

from oracle import match_positions

_REF = "/root/reference/test"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(_REF), reason="reference fixtures not mounted"
)


def _cfg(k=5, ratio=8):
    return IndexConfiguration(
        suffix_array_compression_ratio=ratio,
        kmer_length_in_seed_table=k,
        alphabet_type=AlphabetType.DNA,
    )


@pytest.mark.parametrize(
    "fixture",
    [
        f"{_REF}/multiSequenceIndexTest/sequences.fasta",
        f"{_REF}/multiSequenceIndexTest/test2.fa",
    ],
)
def test_fixture_count_locate_vs_oracle(rng, tmp_path, fixture):
    sequence, metadata = fasta_mod.read_fasta(fixture)
    k = min(5, max(2, len(sequence) // 4))
    path = str(tmp_path / "fixture.awfmi")
    index = create_index_from_fasta(fixture, _cfg(k=k), path)
    assert index.num_sequences() == metadata.num_sequences
    engine = SearchEngine(read_index_from_file(path))

    # sample kmers from the concatenated database (timeSearch.c style)
    n = len(sequence)
    kmers = []
    for _ in range(100):
        length = int(rng.integers(1, min(12, n)))
        start = int(rng.integers(0, n - length + 1))
        kmers.append(sequence[start : start + length])
    counts = engine.count(kmers)
    hits = engine.locate(kmers)
    for kmer, c, h in zip(kmers, counts, hits):
        want = match_positions(sequence, kmer, AlphabetType.DNA)
        assert c == len(want), kmer
        np.testing.assert_array_equal(
            np.sort(h.astype(np.int64)), want, err_msg=repr(kmer)
        )


def test_staticlib_fixture_smoke(rng, tmp_path):
    """staticLibTest/test.fa is junk text mixing 't' and 'u' — the
    reference-inherited ascii-order edge where letter-index matching and
    the suffix order diverge (see oracle.py). The reference's own test
    is a build smoke test (awfmiTest.c); we additionally check internal
    consistency: count == len(locate) and hits are in range."""
    fixture = f"{_REF}/staticLibTest/test.fa"
    sequence, _ = fasta_mod.read_fasta(fixture)
    path = str(tmp_path / "s.awfmi")
    create_index_from_fasta(fixture, _cfg(k=3), path)
    engine = SearchEngine(read_index_from_file(path))
    n = len(sequence)
    kmers = [sequence[i : i + 4] for i in range(0, n - 4, 5)]
    counts = engine.count(kmers)
    hits = engine.locate(kmers)
    for kmer, c, h in zip(kmers, counts, hits):
        assert c == len(h)
        assert c >= 1  # sampled from the sequence itself
        assert (h < n).all()


def test_fixture_headers_roundtrip(tmp_path):
    fixture = f"{_REF}/multiSequenceIndexTest/sequences.fasta"
    _, metadata = fasta_mod.read_fasta(fixture)
    path = str(tmp_path / "h.awfmi")
    create_index_from_fasta(fixture, _cfg(k=3), path)
    loaded = read_index_from_file(path)
    for i in range(metadata.num_sequences):
        assert loaded.get_header(i) == metadata.get_header(i)


def test_stale_pre_v8_binary_rejected_like_reference():
    """test.fasta is a stale pre-v8 .awfmi binary; the current reference
    rejects unsupported versions (awFmIndexIsVersionValid,
    AwFmIndexStruct.c:132-134) and so do we."""
    stale = f"{_REF}/multiSequenceIndexTest/test.fasta"
    raw = open(stale, "rb").read(10)
    assert raw == b"AwFmIndex\n"  # it really is an index file
    with pytest.raises(ValueError, match="version"):
        read_index_from_file(stale)
