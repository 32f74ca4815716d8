"""Batch search API and multi-chip distribution (shard_map)."""
