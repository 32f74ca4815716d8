"""The scaling-report tool runs end-to-end on the virtual CPU mesh."""

import json

from avxwindowfmindex_tpu.tools import scaling_report


def test_scaling_report_single_host(tmp_path, capsys):
    out = tmp_path / "scaling.json"
    rc = scaling_report.main([
        "--bases", "65536", "--queries", "256", "--kmer-len", "15",
        "--seed-k", "6", "--devices", "1,2", "--hosts", "0",
        "--repeats", "1", "--json", str(out),
    ])
    assert rc == 0
    rows = json.loads(out.read_text())["rows"]
    assert [r["devices"] for r in rows] == [1, 2]
    for r in rows:
        assert r["count_qps"] > 0
        assert r["count_allgather_qps"] > 0
        assert r["locate_qps"] > 0
    assert "| rung |" in capsys.readouterr().out


def test_scaling_report_weak_mode(tmp_path):
    out = tmp_path / "scaling.json"
    rc = scaling_report.main([
        "--bases", "65536", "--queries", "128", "--kmer-len", "12",
        "--seed-k", "6", "--devices", "2", "--mode", "weak",
        "--hosts", "0", "--repeats", "1", "--json", str(out),
    ])
    assert rc == 0
    rows = json.loads(out.read_text())["rows"]
    assert rows[0]["queries"] == 256  # 128 per device x 2
