"""HBM capacity planner (utils/capacity.py).

Reference sizing guidance anchor: /root/reference/README.md:188-213
(seed-table memory vs k, SA ratio trade). The planner's picks must
reproduce the measured bench protocol choices (docs/PERFORMANCE.md):
k=14 + dense SA + digram at 64M bases on v5e, k=13 at hg38.
"""

import numpy as np
import pytest

from avxwindowfmindex_tpu.models.config import AlphabetType
from avxwindowfmindex_tpu.utils import capacity as cap

V5E = cap.HBM_BYTES["v5e"]
V5P = cap.HBM_BYTES["v5p"]


def test_detect_hbm_device_kind_strings(monkeypatch):
    """Kind strings must classify by the 16 GB variants FIRST: 'TPU v5e'
    contains 'v5' but not 'lite' and must NOT be budgeted as a 95 GB
    v5p (the planner would then pick an OOM config on a 16 GB chip).
    Unknown kinds fall back to the small budget for the same reason."""

    class _Dev:
        def __init__(self, kind):
            self.device_kind = kind

    cases = {
        "TPU v5 lite": V5E,
        "TPU v5e": V5E,
        "TPU v5p": V5P,
        "TPU v5": V5P,
        "TPU v4": cap.HBM_BYTES["v4"],
        "mystery accelerator": V5E,
    }
    import jax

    for kind, want in cases.items():
        monkeypatch.setattr(jax, "devices", lambda k=kind: [_Dev(k)])
        got, note = cap.detect_hbm_bytes()
        assert got == want, (kind, got, note)


def test_component_bytes_exact_dna():
    comp = cap.component_bytes(
        64_000_000, AlphabetType.DNA, seed_k=14, sa_ratio=8,
        device_sa_ratio=4, ngram=True,
    )
    nb = -(-64_000_001 // 256)
    assert comp["packed"] == nb * 128
    assert comp["packed_pair"] == nb * 256
    assert comp["ngram"] == nb * 384
    assert comp["seed_table"] == 4**14 * 8
    assert comp["sampled_sa"] == -(-64_000_001 // 4) * 4


def test_plan_64m_v5e_matches_bench_protocol():
    plan = cap.plan_capacity(64_000_000, hbm_bytes=V5E, batch=1 << 22)
    assert plan.engine == "replicated"
    assert plan.seed_k == 14
    assert plan.device_sa_ratio == 4
    assert plan.ngram and plan.pair_rows and not plan.wide
    assert plan.per_chip_bytes <= plan.budget


def test_plan_hg38_v5e_matches_bench_protocol():
    plan = cap.plan_capacity(3_100_000_000, hbm_bytes=V5E, batch=1 << 22)
    assert plan.engine == "replicated"
    assert plan.seed_k == 13  # k=14's 2.1 GB table crowds genome tables
    assert plan.device_sa_ratio == 4
    assert plan.ngram
    assert plan.per_chip_bytes <= plan.budget
    # v5p's 95 GB takes k=14 with room
    plan_p = cap.plan_capacity(3_100_000_000, hbm_bytes=V5P, batch=1 << 22)
    assert plan_p.seed_k == 14


def test_degradation_ladder_order():
    """Shrinking HBM drops k first, then dense SA, then digram."""
    picks = []
    for hbm in (16e9, 13e9, 8e9, 6.2e9):
        p = cap.plan_capacity(3_100_000_000, hbm_bytes=int(hbm),
                              batch=1 << 20)
        picks.append((p.seed_k, p.device_sa_ratio, p.ngram))
    ks = [p[0] for p in picks]
    assert ks[0] >= ks[-1]
    assert picks[0][1] == 4 and picks[0][2]
    # at 6.2 GB the dense SA and/or digram must be gone
    assert picks[-1][1] is None or not picks[-1][2]


def test_wide_plan():
    plan = cap.plan_capacity(5_000_000_000, hbm_bytes=V5P, batch=1 << 20)
    assert plan.wide and not plan.ngram
    assert any("2^32" in n for n in plan.notes)
    # wide dense SA is a real option now (models/index.py wide densify
    # + build-time device_sa_ratio): a v5p holds 5G bases with the
    # dense row — 8 B/sample at ratio 4
    assert plan.device_sa_ratio == 4
    assert plan.components["sampled_sa"] == -(-5_000_000_001 // 4) * 8


def test_wide_plan_dense_sa_int32_guard():
    # past 2^31 dense samples the option cannot exist (int32 gather);
    # the planner must drop it rather than emit an unusable plan
    corpus = 9_000_000_000  # bwt/2 > 2^31
    plan = cap.plan_capacity(
        corpus, hbm_bytes=2 * V5P, batch=1 << 20, device_sa_ratio=2
    )
    assert plan.wide and plan.device_sa_ratio is None
    assert any("int32 sample-gather" in n for n in plan.notes)


def test_range_sharded_when_exceeding_chip():
    corpus = 12_000_000_000  # ~15 GB of packed rows alone at wide
    with pytest.raises(ValueError, match="range-sharded|mesh"):
        cap.plan_capacity(corpus, hbm_bytes=int(6e9), n_devices=1,
                          batch=1 << 20)
    plan = cap.plan_capacity(corpus, hbm_bytes=int(6e9), n_devices=8,
                             batch=1 << 20)
    assert plan.engine == "range_sharded"
    assert plan.per_chip_bytes <= plan.budget
    assert plan.per_chip_bytes < plan.index_bytes


def test_amino_plan():
    plan = cap.plan_capacity(16_000_000, AlphabetType.AMINO,
                             hbm_bytes=V5E, batch=1 << 20, kmer_len=20)
    assert plan.engine == "replicated"
    assert plan.seed_k == 6  # amino cap: 20^6 * 8 = 512 MB
    assert not plan.ngram  # n-gram engine is nucleotide-only
    assert plan.device_sa_ratio == 4


def test_seed_k_never_exceeds_kmer_len():
    plan = cap.plan_capacity(64_000_000, hbm_bytes=V5E, batch=1 << 20,
                             kmer_len=12)
    assert plan.seed_k <= 12


def test_index_configuration_roundtrip():
    plan = cap.plan_capacity(1_000_000, hbm_bytes=V5E, batch=1 << 16)
    cfg = plan.index_configuration()
    assert cfg.kmer_length_in_seed_table == plan.seed_k
    assert cfg.suffix_array_compression_ratio == plan.sa_ratio
    assert "replicated" in plan.summary()
