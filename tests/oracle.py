"""Brute-force NumPy oracle, the parity baseline for property tests.

Replaces the reference's strategy of checking the optimized path against
naive strncmp scans and a directly-built suffix array
(test/searchTest/searchTest.c:161-200, test/bwtTest/bwtTest.c:31-100).
"""

from __future__ import annotations

import numpy as np

from avxwindowfmindex_tpu.models import alphabet as alpha
from avxwindowfmindex_tpu.models.config import AlphabetType

# Database pools mirror the constraints the reference implicitly relies
# on (suffixes are sorted by sanitized *ascii*, AwFmCreate.c:99-100):
#  - DNA databases never mix 't' and 'u' (both letter index 3 but distinct
#    ascii — mixing them breaks the merged-alphabet suffix order in the C
#    library too);
#  - amino databases are uniform-case (amino sanitize preserves case,
#    AwFmLetter.c:69-79, and uppercase/lowercase interleave wrongly).
# Mixed-case DNA is fine: the nucleotide sanitizer lowercases.
#  - amino databases keep at most one ascii spelling per letter group:
#    'Z' (kept verbatim by sanitize) must not co-occur with 'z' (the
#    sanitize output for B/X), or the index-20 group's internal order is
#    inconsistent — the reference's tests likewise draw from a single-case
#    pool with one ambiguity spelling (searchTest.c:21-24).
NT_CHARS = b"ACGTacgtNRYkmswx"  # includes ambiguity codes, no u/U
NT_CLEAN = b"ACGT"
AA_CHARS = b"ACDEFGHIKLMNPQRSTVWYBX"  # B/X sanitize to 'z'
AA_CLEAN = b"ACDEFGHIKLMNPQRSTVWY"


def random_sequence(rng, length, alphabet, clean=False):
    pool = (
        (AA_CLEAN if clean else AA_CHARS)
        if alphabet == AlphabetType.AMINO
        else (NT_CLEAN if clean else NT_CHARS)
    )
    arr = np.frombuffer(bytes(pool), dtype=np.uint8)
    return bytes(rng.choice(arr, size=length).tobytes())


def random_kmer(rng, length, alphabet, clean=True):
    return random_sequence(rng, length, alphabet, clean=clean)


def suffix_array_naive(seq_with_sentinel: bytes) -> np.ndarray:
    """Independent O(n^2 log n) suffix array via python sort."""
    order = sorted(range(len(seq_with_sentinel)), key=lambda i: seq_with_sentinel[i:])
    return np.array(order, dtype=np.int64)


def sanitized_letters(sequence: bytes, alphabet) -> np.ndarray:
    """DB sequence -> letter indices (after the builder's sanitize pass)."""
    arr = np.frombuffer(sequence, dtype=np.uint8)
    return alpha.ascii_to_index(alpha.sanitize(arr, alphabet), alphabet)


def kmer_letters(kmer: bytes, alphabet) -> np.ndarray:
    return alpha.ascii_to_index(np.frombuffer(kmer, dtype=np.uint8), alphabet)


def match_positions(sequence: bytes, kmer: bytes, alphabet) -> np.ndarray:
    """All text positions where the kmer matches on letter indices.

    Mirrors the naive strncmp scan of searchTest.c:161-200 (matching is on
    the sanitized sequence, so 'u' == 't' and every ambiguity char
    collapses to x/z).
    """
    seq = sanitized_letters(sequence, alphabet)
    pat = kmer_letters(kmer, alphabet)
    n, m = len(seq), len(pat)
    if m == 0 or m > n:
        return np.empty(0, dtype=np.int64)
    windows = np.lib.stride_tricks.sliding_window_view(seq, m)
    return np.where((windows == pat).all(axis=1))[0].astype(np.int64)


def count_occurrences(sequence: bytes, kmer: bytes, alphabet) -> int:
    return len(match_positions(sequence, kmer, alphabet))
