"""CLI tools: index building and search benchmarking (tuning/ parity)."""
