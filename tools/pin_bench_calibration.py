#!/usr/bin/env python
"""Re-pin tools/bench_calibration.json from shaped-session logs.

Run after each round's driver-shaped sessions on the final HEAD:

    python tools/pin_bench_calibration.py tools/driver_shape_runs/session_[0-9]_r14.stdout.log

For every entry it pins ``session_median`` (the canary denominators)
and ``bands_normalized`` = [0.85 x min, 1.15 x max] over the sessions'
canary-normalized readings (each session divided by its OWN canary
multiplier, so the bands are in normalized units and a mult~1 session
lands mid-band by construction).  The canary set itself is stable
(pure-JVM TPC-H entries whose plans are frozen) and is NOT changed
here.

Protocol (SCALING r14): the driver reading for a NON-canary entry is
adjudicated against bands_normalized after dividing by that run's
canary_mult (bench.py emits both); OVER means entry-specific inflation
the shared machine mode does not explain — investigate the plan.
UNDER is never a failure (min-of-N cannot fake slowness; one-scalar
normalization over-corrects entries whose own mode multiplier sits
below the canary median).  Canary entries are adjudicated by the
sessions themselves (their slow-mode residual spread is the
instrument's input, not its output).
"""

from __future__ import annotations

import json
import os
import statistics as st
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
CAL_PATH = os.path.join(HERE, "bench_calibration.json")


def load_queries(path: str) -> dict:
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if line.startswith("{") and '"queries"' in line:
                return json.loads(line)["queries"]
    raise SystemExit(f"no bench JSON line in {path}")


def main() -> None:
    logs = sys.argv[1:]
    if len(logs) < 3:
        raise SystemExit("need >= 3 session logs to pin medians/bands")
    with open(CAL_PATH) as fh:
        cal = json.load(fh)
    sessions = [load_queries(p) for p in logs]
    keys = sorted(set().union(*[set(s) for s in sessions]))
    med = {
        k: round(st.median([s[k] for s in sessions if k in s]), 4)
        for k in keys
    }
    missing = [c for c in cal["canaries"] if c not in med]
    if missing:
        raise SystemExit(f"canaries missing from sessions: {missing}")
    norm_sessions = []
    for s in sessions:
        infl = sorted(s[c] / med[c] for c in cal["canaries"] if c in s)
        mid = len(infl) // 2
        m = infl[mid] if len(infl) % 2 else (infl[mid - 1] + infl[mid]) / 2
        norm_sessions.append({k: v / m for k, v in s.items()})
    bands = {
        k: [
            round(0.85 * min(ns[k] for ns in norm_sessions if k in ns), 3),
            round(1.15 * max(ns[k] for ns in norm_sessions if k in ns), 3),
        ]
        for k in keys
    }
    cal["session_median"] = med
    cal["bands_normalized"] = bands
    cal["pinned_from"] = ", ".join(os.path.basename(p) for p in logs)
    with open(CAL_PATH, "w") as fh:
        json.dump(cal, fh, indent=1, sort_keys=True)
    print(f"pinned {len(med)} medians + bands from {len(logs)} sessions")


if __name__ == "__main__":
    main()
