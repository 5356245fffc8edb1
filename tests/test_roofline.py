"""Roofline accounting sanity."""

from hash_join_codes_knl_tpu.utils.roofline import (
    hbm_peak_bytes_per_s,
    merge_phj_traffic,
    roofline_report,
)


def test_peak_lookup_runs_on_cpu():
    peak, matched = hbm_peak_bytes_per_s()
    assert peak > 0
    assert matched  # the report labels which table entry (or guess) applied


def test_traffic_model_scales_with_relations():
    t1 = merge_phj_traffic(1_000, 16_000, tile=2048, window=384)
    t2 = merge_phj_traffic(2_000, 32_000, tile=2048, window=384)
    assert t2["partition_probe"] == 2 * t1["partition_probe"]
    assert t2["partition_build"] == 2 * t1["partition_build"]
    assert set(t1) == {"partition_build", "partition_probe", "windows",
                       "probe"}


def test_report_fractions():
    traffic = {"probe": 1_000_000_000}
    rep = roofline_report({"probe": 0.01}, traffic)
    assert rep["probe_gbps"] == 100.0
    assert 0 < rep["probe_pct_roofline"] <= 100 * 100 / 50  # cpu peak 50GB/s
    assert "pipeline_pct_roofline" in rep
