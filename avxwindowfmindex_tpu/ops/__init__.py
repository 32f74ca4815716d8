"""Device ops: rank/occurrence kernels and the seed-table builder."""

from . import rank, seed_table

__all__ = ["rank", "seed_table"]
