"""Diff live floor anchors round-over-round (hw_revalidate step).

bench.py publishes the feasible-floor anchors it used (probe-sort from
the tuner cache, build-sort measured in-process) in an "anchors" field.
This script compares the freshest bench output against the newest
BENCH_r*.json in the repo root and flags drift -- the r4 lesson is that
sort costs and compile ceilings move under UNCHANGED code, so a moved
anchor means the environment changed (re-bracket, re-ratify), while a
silently frozen anchor would rot the headline honesty metric.

Usage:
    python bench.py | tee /tmp/bench.json
    python scripts/diff_anchors.py /tmp/bench.json
or pipe:  python bench.py | python scripts/diff_anchors.py

Exit code 0 = anchors within tolerance (or no prior round to compare);
1 = drift beyond THRESHOLD (investigate before trusting floor deltas).
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

THRESHOLD = 0.10  # relative drift that warrants investigation

# pre-r5 rounds carried no anchors field; these were their implicit
# (frozen) constants, kept here so the first live round still diffs
LEGACY_ANCHORS = {"probe_sort_s": 0.83, "build_sort_s": 0.12}


def _extract_anchors(text: str) -> dict | None:
    """Anchors from bench output (last JSON object line with an
    'anchors' key) or a BENCH_r*.json driver record (parsed.anchors)."""
    try:
        doc = json.loads(text)
        if isinstance(doc, dict):
            if "anchors" in doc:
                return doc["anchors"]
            parsed = doc.get("parsed") or {}
            if "anchors" in parsed:
                return parsed["anchors"]
            if parsed:  # a pre-r5 driver record: bench ran, no anchors
                return dict(LEGACY_ANCHORS)
    except ValueError:
        pass
    got = None
    for line in text.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                doc = json.loads(line)
            except ValueError:
                continue
            if isinstance(doc, dict) and "anchors" in doc:
                got = doc["anchors"]
    return got


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else None
    text = open(src).read() if src else sys.stdin.read()
    cur = _extract_anchors(text)
    if cur is None:
        print("diff_anchors: no anchors found in input (bench failed or "
              "pre-r5 bench.py)")
        return 1

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rounds = sorted(
        glob.glob(os.path.join(root, "BENCH_r*.json")),
        key=lambda p: int(re.search(r"r(\d+)", os.path.basename(p)).group(1)),
    )
    if not rounds:
        print("diff_anchors: no prior BENCH_r*.json; nothing to diff")
        return 0
    prev_path = rounds[-1]
    prev = _extract_anchors(open(prev_path).read())
    if prev is None:
        print(f"diff_anchors: {os.path.basename(prev_path)} carries no "
              "anchors (bench errored that round); nothing to diff")
        return 0

    bad = 0
    for key in ("probe_sort_s", "build_sort_s"):
        a, b = prev.get(key), cur.get(key)
        if a is None or b is None or a == 0:
            continue
        rel = (b - a) / a
        mark = "DRIFT" if abs(rel) > THRESHOLD else "ok"
        print(f"diff_anchors: {key}: {a:.4f} -> {b:.4f} "
              f"({rel:+.1%}) [{mark}] vs {os.path.basename(prev_path)}")
        if abs(rel) > THRESHOLD:
            bad += 1
    if bad:
        print(f"diff_anchors: {bad} anchor(s) drifted beyond "
              f"{THRESHOLD:.0%}: the ENVIRONMENT moved (r4 precedent) -- "
              "floor fractions are not comparable to the prior round "
              "until PERF_NOTES records the new anchors")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
