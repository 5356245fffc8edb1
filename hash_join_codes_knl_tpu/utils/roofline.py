"""Roofline accounting: achieved bandwidth vs the chip's HBM envelope.

The reference reports raw seconds (npj.cpp:1104-1114); the BASELINE target
for this framework is expressed as a fraction of the per-chip HBM roofline
(SURVEY.md section 6), so the bench and the CLI report, per phase:

- the phase's modeled minimum HBM traffic (bytes any implementation of that
  phase must move at least once),
- achieved bytes/s against wall time,
- the fraction of the chip's peak HBM bandwidth that represents.

Traffic model for the merge-mode PHJ pipeline (engine/phj.py):

- prep (partition-as-sort): lower bound = one read + one write of both
  relations' (key, val) streams.  The actual XLA bitonic sort moves a large
  multiple of this (it is compute-bound, not bandwidth-bound) -- which is
  precisely what the roofline fraction makes visible.
- probe: reads the sorted probe keys, writes (match_val, match_cnt), and
  streams each tile's build window once.
"""

from __future__ import annotations

import jax

# Peak HBM bandwidth per chip, bytes/s (public chip specs).
_HBM_PEAK = {
    "TPU v4": 1_228e9,
    "TPU v5 lite": 819e9,  # v5e
    "TPU v5": 2_765e9,  # v5p
    "TPU v6 lite": 1_640e9,  # v6e / Trillium
    "TPU v7": 7_400e9,  # Ironwood
}
_CPU_FALLBACK = 50e9


def hbm_peak_bytes_per_s() -> tuple[float, str]:
    """(peak HBM bandwidth of device 0, the matched table entry).  An
    unrecognized device_kind falls back to the v5e figure with an
    'assumed:' label so the report shows the peak is a guess rather
    than silently mislabeling fractions on new/renamed chips."""
    dev = jax.devices()[0]
    if dev.platform == "cpu":
        return _CPU_FALLBACK, "cpu (nominal DDR)"
    kind = getattr(dev, "device_kind", "")
    for prefix in sorted(_HBM_PEAK, key=len, reverse=True):
        if kind.startswith(prefix):
            return _HBM_PEAK[prefix], prefix
    return _HBM_PEAK["TPU v5 lite"], f"assumed: v5e peak for {kind!r}"


def merge_phj_traffic(ni: int, no: int, tile: int, window: int) -> dict:
    """Per-phase minimum HBM bytes for the merge-mode PHJ pipeline, keyed
    by the staged phase names (engine/phj.py phj_join_merge_staged)."""
    n_tiles = -(-no // tile)
    return {
        "partition_build": 2 * 8 * ni,  # r+w of (key,val) once
        "partition_probe": 2 * 8 * no,
        "windows": 4 * (2 * n_tiles + ni // 128),  # tile bounds + directory
        "probe": 4 * no + 8 * no + 8 * window * n_tiles,
    }


def roofline_report(phase_seconds: dict, traffic: dict) -> dict:
    """Achieved bytes/s and roofline fraction per phase + overall."""
    peak, matched = hbm_peak_bytes_per_s()
    out = {"hbm_peak_gbps": round(peak / 1e9, 1),
           "hbm_peak_source": matched}
    tot_b = tot_s = 0.0
    for phase, sec in phase_seconds.items():
        b = traffic.get(phase)
        if b is None or sec <= 0:
            continue
        tot_b += b
        tot_s += sec
        out[f"{phase}_gbps"] = round(b / sec / 1e9, 2)
        out[f"{phase}_pct_roofline"] = round(100 * b / sec / peak, 2)
    if tot_s > 0:
        out["pipeline_pct_roofline"] = round(100 * tot_b / tot_s / peak, 2)
    return out
