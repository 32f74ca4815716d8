"""The FM-index data model.

The reference stores the BWT as 256-position blocks of strided bit-plane
SIMD vectors with per-block occurrence milestones (AwFmIndex.h:55-65).
That layout is a *latency* optimization for cache-line pointer chasing.

The TPU-native layout keeps the same information in device-friendly
shapes (SURVEY.md §7 design stance):

  - ``letters``      (num_blocks, 256) int8   — BWT letter index per
    position. Rank = gather block row + masked compare + sum on the VPU.
  - ``milestones``   (num_blocks, A+1) uint32 — per-letter occurrence
    count at each block start (the reference's baseOccurrences).
  - ``prefix_sums``  (A+2,) uint32            — cumulative letter counts
    with the sentinel counted into prefix_sums[0]=1 (AwFmCreate.c:338-344).
  - ``seed_table``   (A**k, 2) uint32         — memoized BWT range of
    every k-length suffix (AwFmCreate.c:407-450).
  - ``sampled_sa``   (ceil(bwtLen/ratio),) uint32 — suffix-array samples
    at BWT positions ≡ 0 (mod ratio) (AwFmSuffixArray.c:76-77).

Positions are uint32 on device (covers hg38 + sentinel); the host model
keeps int64/uint64 NumPy arrays and is the serde source of truth.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from . import alphabet as alpha
from .config import (
    CURRENT_VERSION_NUMBER,
    FEATURE_FLAG_BIT_FASTA_VECTOR,
    AlphabetType,
    IndexConfiguration,
)

POSITIONS_PER_BLOCK = alpha.POSITIONS_PER_BLOCK


# ---------------------------------------------------------------------------
# Geometry helpers (AwFmIndexStruct.c:77-130)
# ---------------------------------------------------------------------------

def block_index_from_position(position):
    """pos // 256 (AwFmIndexStruct.c:117-119)."""
    return position // POSITIONS_PER_BLOCK


def local_position_in_block(position):
    """pos % 256 (AwFmIndexStruct.c:121-124)."""
    return position % POSITIONS_PER_BLOCK


def num_blocks_from_bwt_length(bwt_length: int) -> int:
    """1 + (len-1)//256 (AwFmIndexStruct.c:104-106)."""
    return 1 + (bwt_length - 1) // POSITIONS_PER_BLOCK


def search_range_length(start, end):
    """end - start + 1 if valid else 0 (AwFmIndexStruct.c:126-130)."""
    start = np.asarray(start)
    end = np.asarray(end)
    return np.where(start <= end, end - start + 1, 0)


def search_range_is_valid(start, end):
    """startPtr <= endPtr (AwFmIndexStruct.c:99-102)."""
    return start <= end


def prefix_sums_length(alphabet: AlphabetType) -> int:
    """|A| + 2 (AwFmIndexStruct.c:108-111)."""
    return alpha.cardinality(alphabet) + 2


def kmer_table_length(alphabet: AlphabetType, k: int) -> int:
    """|A| ** k (AwFmIndexStruct.c:77-86)."""
    return alpha.cardinality(alphabet) ** k


def sampled_sa_length(bwt_length: int, ratio: int) -> int:
    """ceil(bwtLength / ratio) (AwFmSuffixArray.c:144-147)."""
    return (bwt_length + ratio - 1) // ratio


# ---------------------------------------------------------------------------
# FASTA metadata (FastaVector equivalent)
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class FastaMetadata:
    """Multi-sequence metadata, equivalent to the reference's FastaVector
    header/metadata vectors (used at AwFmCreate.c:162-196,
    AwFmSearch.c:284-315, AwFmFile.c:157-187).

    ``headers`` is the concatenated header text; ``header_ends`` and
    ``sequence_ends`` are cumulative end offsets per sequence (exclusive),
    matching FastaVectorMetadata's {headerEndPosition, sequenceEndPosition}.
    """

    headers: bytes
    header_ends: np.ndarray  # (num_seqs,) uint64, cumulative exclusive ends
    sequence_ends: np.ndarray  # (num_seqs,) uint64, cumulative exclusive ends

    @property
    def num_sequences(self) -> int:
        return len(self.sequence_ends)

    def get_header(self, sequence_number: int) -> bytes:
        start = 0 if sequence_number == 0 else int(self.header_ends[sequence_number - 1])
        return self.headers[start:int(self.header_ends[sequence_number])]

    def local_position_from_global(self, global_position):
        """Global concatenated position -> (sequence_number, local_position).

        Vectorized equivalent of fastaVectorGetLocalSequencePositionFromGlobal
        (used at AwFmSearch.c:284-301): searchsorted over cumulative ends.
        """
        pos = np.asarray(global_position, dtype=np.uint64)
        seq_num = np.searchsorted(self.sequence_ends, pos, side="right")
        starts = np.concatenate([[0], self.sequence_ends[:-1]]).astype(np.uint64)
        local = pos - starts[seq_num]
        return seq_num, local


# ---------------------------------------------------------------------------
# Device-side view
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class DeviceIndex:
    """Device (jax.Array) view of the index, ready for batched search."""

    letters: object  # (num_blocks, 256) int8
    milestones: object  # (num_blocks, A+1) uint32
    prefix_sums: object  # (A+2,) uint32
    seed_table: object  # (A**k, 2) uint32
    sampled_sa: object  # (num_samples,) uint32
    bwt_length: int
    ratio: int
    kmer_length_in_seed_table: int
    alphabet: AlphabetType

    @property
    def cardinality(self) -> int:
        return alpha.cardinality(self.alphabet)

    @property
    def sentinel(self) -> int:
        return alpha.sentinel_index(self.alphabet)


# ---------------------------------------------------------------------------
# Host-side canonical index
# ---------------------------------------------------------------------------

@dataclasses.dataclass
class FmIndex:
    """Host-canonical FM index (struct AwFmIndex, AwFmIndex.h:94-109).

    Holds NumPy arrays; use :meth:`to_device` for the search-ready jax view.
    """

    config: IndexConfiguration
    bwt_length: int
    bwt_letters: np.ndarray  # (bwt_length,) uint8 letter indices
    prefix_sums: np.ndarray  # (A+2,) uint64
    kmer_seed_table: np.ndarray  # (A**k, 2) uint64 [start, end]
    sampled_sa: Optional[np.ndarray]  # (num_samples,) uint64; None if on disk
    version_number: int = CURRENT_VERSION_NUMBER
    feature_flags: int = 0
    sequence: Optional[bytes] = None  # original (unsanitized) sequence
    fasta_metadata: Optional[FastaMetadata] = None
    file_path: Optional[str] = None  # backing .awfmi file, if any
    suffix_array_file_offset: Optional[int] = None
    sequence_file_offset: Optional[int] = None
    _device_cache: Optional[DeviceIndex] = dataclasses.field(
        default=None, repr=False, compare=False
    )

    # -- basic getters ------------------------------------------------------

    @property
    def alphabet(self) -> AlphabetType:
        return self.config.alphabet_type

    @property
    def cardinality(self) -> int:
        return alpha.cardinality(self.alphabet)

    @property
    def sentinel_index(self) -> int:
        return alpha.sentinel_index(self.alphabet)

    @property
    def num_blocks(self) -> int:
        return num_blocks_from_bwt_length(self.bwt_length)

    @property
    def contains_fasta_vector(self) -> bool:
        """featureFlags bit 0 (AwFmIndexStruct.c:136-139)."""
        return bool(self.feature_flags & (1 << FEATURE_FLAG_BIT_FASTA_VECTOR))

    def num_sequences(self) -> int:
        """awFmGetNumSequences (AwFmIndexStruct.c:149-155)."""
        if self.fasta_metadata is not None:
            return self.fasta_metadata.num_sequences
        return 1

    def bwt_position_is_sampled(self, position) -> np.ndarray:
        """pos % ratio == 0 (AwFmIndexStruct.c:88-91)."""
        return np.asarray(position) % self.config.suffix_array_compression_ratio == 0

    # -- host-side milestone/rank helpers (used by builders & oracles) ------

    def letters_as_blocks(self) -> np.ndarray:
        """(num_blocks, 256) uint8, tail padded with the sentinel index."""
        n_blocks = self.num_blocks
        padded = np.full(n_blocks * POSITIONS_PER_BLOCK, self.sentinel_index, np.uint8)
        padded[: self.bwt_length] = self.bwt_letters
        return padded.reshape(n_blocks, POSITIONS_PER_BLOCK)

    def milestones(self) -> np.ndarray:
        """(num_blocks, A+2) uint64 occurrence counts at block starts.

        Column j = count of letter j in bwt_letters[: 256*block].
        Includes the ambiguity letter (col A) and sentinel (col A+1),
        mirroring baseOccurrences (AwFmCreate.c:309, 366).
        """
        n_letters = self.cardinality + 2
        blocks = block_index_from_position(np.arange(self.bwt_length))
        counts = np.bincount(
            blocks * n_letters + self.bwt_letters.astype(np.int64),
            minlength=self.num_blocks * n_letters,
        ).reshape(self.num_blocks, n_letters).astype(np.uint64)
        cum = np.cumsum(counts, axis=0)
        milestones = np.zeros_like(cum)
        milestones[1:] = cum[:-1]
        return milestones

    # -- device view --------------------------------------------------------

    def to_device(self, devices=None, refresh: bool = False) -> DeviceIndex:
        """Upload the search-critical arrays to the default device(s)."""
        import jax.numpy as jnp

        if self._device_cache is not None and not refresh:
            return self._device_cache
        if self.bwt_length >= 2**32:
            raise NotImplementedError(
                "device path uses uint32 positions; bwtLength >= 2**32 "
                "requires the int64 escape hatch (not yet implemented)"
            )
        milestones = self.milestones()[:, : self.cardinality + 1]
        dev = DeviceIndex(
            letters=jnp.asarray(self.letters_as_blocks().astype(np.int8)),
            milestones=jnp.asarray(milestones.astype(np.uint32)),
            prefix_sums=jnp.asarray(self.prefix_sums.astype(np.uint32)),
            seed_table=jnp.asarray(self.kmer_seed_table.astype(np.uint32)),
            # None = suffix array left on disk; locate resolves via file
            # reads (awFmGetSuffixArrayValueFromFile parity)
            sampled_sa=(
                None
                if self.sampled_sa is None
                else jnp.asarray(self.sampled_sa.astype(np.uint32))
            ),
            bwt_length=int(self.bwt_length),
            ratio=int(self.config.suffix_array_compression_ratio),
            kmer_length_in_seed_table=int(self.config.kmer_length_in_seed_table),
            alphabet=self.alphabet,
        )
        self._device_cache = dev
        return dev

    # -- FastaVector-parity accessors ---------------------------------------

    def get_local_sequence_position(self, global_position):
        """awFmGetLocalSequencePositionFromIndexPosition (AwFmSearch.c:284-301)."""
        if self.fasta_metadata is None:
            raise ValueError("index was not built from a FASTA (no metadata)")
        return self.fasta_metadata.local_position_from_global(global_position)

    def get_header(self, sequence_number: int) -> bytes:
        """awFmGetHeaderStringFromSequenceNumber (AwFmSearch.c:303-315)."""
        if self.fasta_metadata is None:
            raise ValueError("index was not built from a FASTA (no metadata)")
        return self.fasta_metadata.get_header(sequence_number)
