"""Parity-audit regressions: boundary cases where the engine's behavior
is pinned against the reference C sources (or deliberately diverges —
see docs/PARITY.md "Deliberate divergences").
"""

import dataclasses

import numpy as np
import pytest

import jax.numpy as jnp

from avxwindowfmindex_tpu import (
    AlphabetType,
    IndexConfiguration,
    SearchEngine,
    create_index,
    create_index_from_fasta,
    read_index_from_file,
)
from avxwindowfmindex_tpu import search as search_mod
from avxwindowfmindex_tpu.io import awfmi

from oracle import random_kmer, random_sequence


def _cfg(alphabet=AlphabetType.DNA, k=3, ratio=4):
    return IndexConfiguration(
        suffix_array_compression_ratio=ratio,
        kmer_length_in_seed_table=k,
        alphabet_type=alphabet,
    )


def test_resolve_samples_u32_wrap_near_2_32(rng):
    """(sa + offset) can exceed 2^32 on indexes with bwtLength > 2^31:
    the plain uint32 `%` computed the mod of the WRAPPED sum, placing
    hits (2^32 - bwtLength) too low; the reference does this in u64
    (AwFmSuffixArray.c:189-190)."""
    seq = random_sequence(rng, 2000, AlphabetType.DNA)
    index = create_index(seq, _cfg())
    dev = index.to_device()
    n = 2**32 - 1000
    # sampled value near the top of the index + a backtrace offset that
    # pushes the u32 sum past 2^32: expected (n-1 + 2001) % n == 2000
    fake = dataclasses.replace(
        dev,
        bwt_length=n,
        sampled_sa=jnp.asarray(
            np.array([n - 1, 123], dtype=np.uint32)
        ),
    )
    p = jnp.asarray(np.array([0, 4], dtype=np.uint32))  # sample idx 0, 1
    off = jnp.asarray(np.array([2001, 5], dtype=np.uint32))
    got = np.asarray(search_mod._resolve_samples(fake, p, off))
    # [0]: was 1000 with the wrapped-mod bug; [1]: ordinary no-wrap case
    np.testing.assert_array_equal(got, np.array([2000, 128], dtype=np.uint32))
    index._device_cache = None


def test_single_query_parity_api_on_wide_indexes(rng, monkeypatch):
    """find_search_range_for_string / single_kmer_exists /
    iterative_step_backward_search / backtrace_return_previous_letter_index
    must work on the wide (hi/lo) device layout, not crash on the
    missing prefix_sums field."""
    from avxwindowfmindex_tpu.models.index import FmIndex
    from avxwindowfmindex_tpu import (
        backtrace_return_previous_letter_index,
        find_search_range_for_string,
        iterative_step_backward_search,
        single_kmer_exists,
    )

    seq = random_sequence(rng, 3000, AlphabetType.DNA)
    index = create_index(seq, _cfg())
    kmer = bytes(seq[100:107])
    want_range = find_search_range_for_string(index, kmer)
    want_step = iterative_step_backward_search(index, *want_range, 2)
    want_bt = backtrace_return_previous_letter_index(index, 37)
    want_bt0 = backtrace_return_previous_letter_index(index, 0)

    orig = FmIndex.to_device
    monkeypatch.setattr(
        FmIndex,
        "to_device",
        lambda self, refresh=False, wide=None: orig(
            self, refresh=refresh, wide=True
        ),
    )
    index._device_cache = None
    assert find_search_range_for_string(index, kmer) == want_range
    assert single_kmer_exists(index, kmer)
    assert iterative_step_backward_search(index, *want_range, 2) == want_step
    assert backtrace_return_previous_letter_index(index, 37) == want_bt
    assert backtrace_return_previous_letter_index(index, 0) == want_bt0
    index._device_cache = None


def test_amino_jou_seed_ineligible_consistent(rng):
    """J/O/U sanitize to the ambiguity letter on BOTH sides; a query
    containing them must count like the explicit ambiguity letter, not
    like the reference's aliased base-20 seed lookup (documented
    divergence, docs/PARITY.md)."""
    seq = random_sequence(rng, 3000, AlphabetType.AMINO)
    index = create_index(seq, _cfg(AlphabetType.AMINO, k=2))
    eng = SearchEngine(index)
    for bad, canonical in ((b"LU", b"LZ"), (b"AO", b"AZ"), (b"MJ", b"MZ")):
        np.testing.assert_array_equal(
            eng.count([bad]), eng.count([canonical])
        )


def test_get_header_rejects_negative(rng, tmp_path):
    fasta = tmp_path / "m.fasta"
    fasta.write_text(">one\nGATTACA\n>two\nACGTACGT\n>three\nTTTT\n")
    index = create_index_from_fasta(str(fasta), _cfg())
    assert index.get_header(2) == b"three"
    with pytest.raises(IndexError, match="out of range"):
        index.get_header(-1)
    with pytest.raises(IndexError):
        index.get_header(3)


def test_read_sequence_rejects_negative_start(rng, tmp_path):
    seq = random_sequence(rng, 500, AlphabetType.DNA)
    path = str(tmp_path / "s.awfmi")
    cfg = _cfg()
    index = create_index(seq, cfg, file_src=path)
    good = awfmi.read_sequence_from_file(index, 10, 20)
    assert len(good) == 20
    with pytest.raises(IndexError):
        awfmi.read_sequence_from_file(index, -100, 50)
    with pytest.raises(IndexError):
        awfmi.read_sequence_from_file(index, 10, -5)


def test_version_field_u16_truncation_accepted(rng, tmp_path):
    """The reference validates the on-disk u32 version through a
    uint16_t (AwFmIndexStruct.c:132-134): version 8 + 65536 loads
    there, so it must load here too."""
    seq = random_sequence(rng, 400, AlphabetType.DNA)
    path = tmp_path / "v.awfmi"
    index = create_index(seq, _cfg(), file_src=str(path))
    want = SearchEngine(index).count([b"ACGT"])
    data = bytearray(path.read_bytes())
    off = len(b"AwFmIndex\n")
    data[off : off + 4] = (8 + 65536).to_bytes(4, "little")
    path.write_bytes(bytes(data))
    loaded = read_index_from_file(str(path))
    np.testing.assert_array_equal(SearchEngine(loaded).count([b"ACGT"]), want)
    # a genuinely different u16 version still fails
    data[off : off + 4] = (9).to_bytes(4, "little")
    path.write_bytes(bytes(data))
    with pytest.raises(ValueError, match="version"):
        read_index_from_file(str(path))


def test_mixed_case_amino_database_warns(rng):
    """A mixed-case amino database makes locate loop forever in BOTH
    libraries (suffix order is case-sensitive byte order, matching
    collapses case — LF gains fixed points): the builder must warn."""
    import warnings

    seq = (b"ACDEF" * 100) + (b"acdef" * 100)
    with pytest.warns(UserWarning, match="mixed-case amino"):
        create_index(seq, _cfg(AlphabetType.AMINO, k=2))
    # single-case amino and mixed-case DNA stay silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        create_index(b"ACDEF" * 100, _cfg(AlphabetType.AMINO, k=2))
        create_index(b"ACGTacgt" * 50, _cfg(AlphabetType.DNA, k=2))
