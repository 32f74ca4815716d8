"""Chunked-corpus indexing: databases beyond the uint32 device limit.

The reference supports arbitrary 64-bit sequences by using uint64
everywhere (at AVX2 speeds). The TPU engine keeps device positions
uint32 for bandwidth; databases larger than 2^32-1 positions (or larger
than one chip wants to hold) are instead split into overlapping
sub-indexes:

  - chunk i covers [i*chunk_bases, i*chunk_bases + chunk_bases
    + overlap), with overlap >= max query length - 1 so matches that
    straddle a boundary are found in the earlier chunk;
  - a hit is attributed to the chunk where it STARTS inside the
    non-overlap span, so nothing is double-counted;
  - count/locate fan out over the sub-indexes (each of which can also
    be device-replicated or mesh-sharded) and merge with global offsets.

Matching semantics are identical to one big index except that matches
may not span more than `overlap + 1` positions across a chunk boundary
— choose `overlap` >= your longest query.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Union

import numpy as np

from ..build import create_index
from ..models.config import IndexConfiguration
from ..search import SearchEngine


class ChunkedCorpusIndex:
    """A list of overlapping sub-indexes behaving like one big index."""

    def __init__(self, engines: List[SearchEngine], chunk_bases: int,
                 overlap: int, total_bases: int):
        self.engines = engines
        self.chunk_bases = chunk_bases
        self.overlap = overlap
        self.total_bases = total_bases

    @classmethod
    def build(
        cls,
        sequence: Union[bytes, np.ndarray],
        config: Optional[IndexConfiguration] = None,
        chunk_bases: int = (1 << 31),
        overlap: int = 255,
        engine_factory=SearchEngine,
    ) -> "ChunkedCorpusIndex":
        if isinstance(sequence, np.ndarray):
            sequence = sequence.tobytes()
        total = len(sequence)
        if chunk_bases < 1 or overlap < 0:
            raise ValueError("chunk_bases must be >=1 and overlap >= 0")
        engines = []
        for start in range(0, total, chunk_bases):
            chunk = sequence[start : start + chunk_bases + overlap]
            engines.append(engine_factory(create_index(chunk, config)))
        return cls(engines, chunk_bases, overlap, total)

    @property
    def num_chunks(self) -> int:
        return len(self.engines)

    def _check_query_lengths(self, kmers) -> None:
        max_len = max(len(k) for k in kmers)
        if max_len > self.overlap + 1 and self.num_chunks > 1:
            raise ValueError(
                f"query length {max_len} exceeds chunk overlap + 1 "
                f"({self.overlap + 1}); rebuild with a larger overlap"
            )

    def locate(self, kmers: Sequence[Union[str, bytes]]) -> List[np.ndarray]:
        """Global hit positions per kmer, merged across chunks."""
        self._check_query_lengths(kmers)
        merged: List[List[np.ndarray]] = [[] for _ in kmers]
        for i, engine in enumerate(self.engines):
            offset = i * self.chunk_bases
            for j, hits in enumerate(engine.locate(kmers)):
                # attribute a hit to the chunk where it starts inside the
                # non-overlap span (the overlap's copies belong to the
                # NEXT chunk's head)
                local = hits[hits < self.chunk_bases]
                if len(local):
                    merged[j].append(local.astype(np.uint64) + offset)
        return [
            np.sort(np.concatenate(parts)) if parts
            else np.empty(0, dtype=np.uint64)
            for parts in merged
        ]

    def count(self, kmers: Sequence[Union[str, bytes]]) -> np.ndarray:
        """Occurrence counts per kmer (derived from deduplicated hits)."""
        return np.array([len(h) for h in self.locate(kmers)], dtype=np.uint64)
