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
