"""Roofline accounting sanity tests."""

from avxwindowfmindex_tpu.utils import roofline


def test_rows_per_query():
    assert roofline.rows_per_query(25, 12, 8, locate=False) == 26
    assert roofline.rows_per_query(25, 12, 8, locate=True) == 34
    assert roofline.rows_per_query(12, 12, 8, locate=False) == 0


def test_report_fields():
    rep = roofline.report(
        2_500_000, 25, 12, 8, row_bytes=128, locate=False,
        chip=roofline.CHIPS["v5e"],
    )
    assert rep["bytes_per_query"] == 26 * 128
    assert 0 < rep["fraction_of_hbm_sol"] < 1
    assert 0 < rep["fraction_of_gather_ceiling"] <= 1.0
    assert rep["chip"] == "TPU v5e"


def test_report_zero_gather_workload():
    """kmer_len == seed_k in count mode: zero gathers per query must
    report an unbounded roofline, not divide by zero."""
    from avxwindowfmindex_tpu.utils.roofline import CHIPS, report

    out = report(1e6, kmer_len=12, seed_k=12, ratio=8, row_bytes=128,
                 locate=False, chip=CHIPS["v5e"])
    assert out["rows_per_query"] == 0.0
    assert out["hbm_speed_of_light_qps"] is None
    # locate still gathers ~ratio rows per hit
    out2 = report(1e6, kmer_len=12, seed_k=12, ratio=8, row_bytes=128,
                  locate=True, chip=CHIPS["v5e"])
    assert out2["rows_per_query"] == 8.0
