"""Letter codec parity tests (model: test/letterTest/AwFmLetterTest.c)."""

import numpy as np

from avxwindowfmindex_tpu.models import alphabet as alpha
from avxwindowfmindex_tpu.models.config import AlphabetType


def test_nucleotide_ascii_to_index_exhaustive():
    # AwFmLetter.c:4-22 — the reference switches on (byte | 0x20), which
    # also maps e.g. byte 0x04 to the sentinel (0x04|0x20 == '$')
    expected = {"a": 0, "c": 1, "g": 2, "t": 3, "u": 3, "$": 5}
    for code in range(256):
        want = expected.get(chr(code | 0x20), 4)
        got = int(alpha.nucleotide_ascii_to_index(code))
        assert got == want, (code, got, want)


def test_nucleotide_sanitize_exhaustive():
    # AwFmLetter.c:24-42 — same (byte | 0x20) rule, lowercase output
    for code in range(256):
        low = chr(code | 0x20)
        want = low if low in "acgtu$" else "x"
        assert chr(alpha.sanitize(code, AlphabetType.DNA)) == want, code


def test_nucleotide_sanitize():
    # AwFmLetter.c:24-42 — keeps acgtu$ (lowercased), else 'x'
    for ch, want in [("A", "a"), ("a", "a"), ("T", "t"), ("U", "u"),
                     ("$", "$"), ("N", "x"), ("z", "x"), ("#", "x")]:
        assert chr(alpha.sanitize(ord(ch), AlphabetType.DNA)) == want


def test_nucleotide_vector_roundtrip():
    # AwFmLetter.c:44-53
    assert list(alpha.NT_INDEX_TO_VECTOR) == [6, 5, 3, 1, 2, 4]
    for idx in range(6):
        vec = alpha.NT_INDEX_TO_VECTOR[idx]
        assert alpha.NT_VECTOR_TO_INDEX[vec] == idx


def test_amino_ascii_to_index():
    # AwFmLetter.c:55-67 — both cases map identically
    order = "ACDEFGHIKLMNPQRSTVWY"
    for i, ch in enumerate(order):
        assert int(alpha.amino_ascii_to_index(ord(ch))) == i
        assert int(alpha.amino_ascii_to_index(ord(ch.lower()))) == i
    for ch in "BXZJOUbxzjou":
        assert int(alpha.amino_ascii_to_index(ord(ch))) == 20
    assert int(alpha.amino_ascii_to_index(ord("$"))) == 21


def test_amino_sanitize():
    # AwFmLetter.c:69-79 — b/x (any case) and NUL -> 'z'; case preserved
    for ch in "bBxX":
        assert chr(alpha.sanitize(ord(ch), AlphabetType.AMINO)) == "z"
    assert chr(alpha.sanitize(0, AlphabetType.AMINO)) == "z"
    for ch in "AaWwZz$":
        assert chr(alpha.sanitize(ord(ch), AlphabetType.AMINO)) == ch


def test_amino_vector_roundtrip():
    # AwFmLetter.c:81-96
    expected = [0x0C, 0x17, 0x03, 0x06, 0x1E, 0x1A, 0x1B, 0x19, 0x15, 0x1C,
                0x1D, 0x08, 0x09, 0x04, 0x13, 0x0A, 0x05, 0x16, 0x01, 0x02,
                0x1F, 0x00]
    assert list(alpha.AA_INDEX_TO_VECTOR) == expected
    for idx in range(22):
        vec = alpha.AA_INDEX_TO_VECTOR[idx]
        assert alpha.AA_VECTOR_TO_INDEX[vec] == idx


def test_ambiguity_predicate():
    # AwFmLetter.c:98-125
    for ch in "acgtuACGTU":
        assert not alpha.is_ambiguous(ord(ch), AlphabetType.DNA)
    for ch in "nNxX#$":
        assert alpha.is_ambiguous(ord(ch), AlphabetType.DNA)
    for ch in "zxbZXB":
        assert alpha.is_ambiguous(ord(ch), AlphabetType.AMINO)
    for ch in "aAwWqQ":
        assert not alpha.is_ambiguous(ord(ch), AlphabetType.AMINO)


def test_rna_aliases_to_t():
    # 'u' -> 3, same as 't' (AwFmLetter.c:15-16)
    seq = np.frombuffer(b"uUtT", dtype=np.uint8)
    assert (alpha.nucleotide_ascii_to_index(seq) == 3).all()


def test_byte_0x04_maps_to_sentinel():
    # 0x04 | 0x20 == 0x24 == '$' — the reference's switch sees a sentinel
    assert int(alpha.nucleotide_ascii_to_index(0x04)) == 5
    assert chr(alpha.sanitize(0x04, AlphabetType.DNA)) == "$"
