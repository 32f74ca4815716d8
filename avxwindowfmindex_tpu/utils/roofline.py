"""Roofline accounting: measured throughput vs HBM speed-of-light.

The reference has no profiling subsystem (SURVEY.md §5); the TPU build's
north star requires reporting the rank/occurrence inner loop against
per-chip HBM speed-of-light (BASELINE.md). The search pipeline is
gather-bound, so the roofline is expressed two ways:

  - bytes: fused-row bytes moved per query vs peak HBM bandwidth;
  - rows:  row-gather descriptors per query vs the measured sustainable
    random row-gather rate (the practical ceiling on current TPUs: XLA
    row gathers are descriptor/lane-row-bound well below byte peak).
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass
class ChipSpec:
    name: str
    hbm_gbps: float  # peak HBM bandwidth, GB/s
    # sustained random 128-lane-row gather rate, measured (rows/s)
    gather_rows_per_sec: float


# Peak HBM numbers are public chip specs; gather rates are measured on
# this project's rank kernel (see ops/rank.py docstring).
CHIPS = {
    "v5e": ChipSpec("TPU v5e", 819.0, 72e6),
    "v5p": ChipSpec("TPU v5p", 2765.0, 243e6),  # scaled by BW ratio
}


def detect_chip() -> ChipSpec:
    import jax

    kind = jax.devices()[0].device_kind.lower()
    if "v5p" in kind or "v5" in kind and "lite" not in kind:
        return CHIPS.get("v5p", CHIPS["v5e"])
    return CHIPS["v5e"]


def rows_per_query(kmer_len: int, seed_k: int, ratio: int, locate: bool) -> float:
    """Fused-row gathers per query.

    count: (kmer_len - seed_k) extension steps x 2 sides.
    locate adds ~ratio backtrace rows per resolved hit.
    """
    rows = 2.0 * max(0, kmer_len - seed_k)
    if locate:
        rows += float(ratio)
    return rows


def report(
    queries_per_sec: float,
    kmer_len: int,
    seed_k: int,
    ratio: int,
    row_bytes: int,
    locate: bool,
    chip: ChipSpec = None,
) -> dict:
    """Roofline summary dict for a measured throughput."""
    chip = chip or detect_chip()
    rows = rows_per_query(kmer_len, seed_k, ratio, locate)
    if rows <= 0:
        # kmer_len == seed_k in count mode: the seed table answers the
        # whole query with zero gathers — the roofline is unbounded
        return {
            "chip": chip.name,
            "rows_per_query": 0.0,
            "bytes_per_query": 0.0,
            "hbm_speed_of_light_qps": None,
            "gather_rate_ceiling_qps": None,
            "fraction_of_hbm_sol": None,
            "fraction_of_gather_ceiling": None,
        }
    bytes_per_query = rows * row_bytes
    sol_bytes_qps = chip.hbm_gbps * 1e9 / bytes_per_query
    sol_rows_qps = chip.gather_rows_per_sec / rows
    return {
        "chip": chip.name,
        "rows_per_query": rows,
        "bytes_per_query": bytes_per_query,
        "hbm_speed_of_light_qps": round(sol_bytes_qps),
        "gather_rate_ceiling_qps": round(sol_rows_qps),
        "fraction_of_hbm_sol": round(queries_per_sec / sol_bytes_qps, 4),
        "fraction_of_gather_ceiling": round(queries_per_sec / sol_rows_qps, 4),
    }
