#!/usr/bin/env python
"""Per-scene performance gate: run bench.py and fail on red deltas.

VERDICT round 5 item 2: an engine cutover tuned on one scene halved
another (Serre 35 -> 18.9 Mrays/s in round 4) because nothing gated
dispatch changes on the full reference-scene matrix.  Run this before
landing any engine or dispatch change:

    python tools/perf_gate.py            # full gate on the TPU
    python tools/perf_gate.py --allow 0.85   # custom tolerance

Exit code 0 iff every throughput metric's vs_baseline >= the allowed
fraction AND every *_err metric's value stays under its target.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import BASELINES  # noqa: E402  (the single source of pins)

# verdict round-5 floors (absolute, Mrays/s) - the per-scene regression
# gate proper; vs_baseline additionally catches drift on everything else
FLOORS = {
    "ref_serre_forward_mrays_per_s": 35.0,
    "ref_furnace_forward_mrays_per_s": 87.0,
    "ref_cornell_forward_mrays_per_s": 852.0,
    "ref_monkey_forward_mrays_per_s": 6.8,
    "big150k_forward_mrays_per_s": 5.0,
}
ERR_TARGETS = {
    "cornell_grad_albedo_max_abs_err": 5e-3,
    "cornell_grad_roughness_max_abs_err": 5e-3,
    "cornell_pixel_grad_max_abs_err": 1e-3,
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--allow", type=float, default=0.90,
                    help="min vs_baseline fraction for throughput metrics")
    ap.add_argument("--from-json", help="gate a recorded BENCH_r*.json "
                    "instead of running bench.py")
    args = ap.parse_args()

    if args.from_json:
        lines = open(args.from_json).read().splitlines()
    else:
        proc = subprocess.run(
            [sys.executable, "bench.py"], capture_output=True, text=True
        )
        sys.stderr.write(proc.stderr[-2000:])
        if proc.returncode != 0:
            print(f"FAIL: bench.py rc={proc.returncode}")
            return 1
        lines = proc.stdout.splitlines()

    failures = []
    seen = set()
    for line in lines:
        line = line.strip()
        if not line.startswith("{"):
            continue
        try:
            rec = json.loads(line)
        except json.JSONDecodeError:
            continue
        metric, value = rec.get("metric"), rec.get("value")
        if metric is None:
            continue
        seen.add(metric)
        print(line)
        if metric in ERR_TARGETS:
            if value > ERR_TARGETS[metric]:
                failures.append(
                    f"{metric}: {value} > target {ERR_TARGETS[metric]}"
                )
        elif metric in FLOORS and value < FLOORS[metric]:
            failures.append(f"{metric}: {value} < floor {FLOORS[metric]}")
        elif metric.endswith("_mrays_per_s"):
            # recompute against the CURRENT pins (a recorded JSON's
            # vs_baseline field reflects the pins at record time)
            base = BASELINES.get(metric)
            vs = value / base if base else rec.get("vs_baseline", 1.0)
            if vs < args.allow:
                failures.append(f"{metric}: vs_baseline {vs:.3f} < {args.allow}")
    for metric in FLOORS:
        if metric not in seen:
            failures.append(f"{metric}: missing from bench output")

    if failures:
        print("PERF GATE FAIL:")
        for f in failures:
            print(f"  - {f}")
        return 1
    print("PERF GATE OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
