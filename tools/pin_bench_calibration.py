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
    """Session logs AND driver BENCH_r{N}.json — same loader as
    normalize_bench."""
    sys.path.insert(0, HERE)
    from normalize_bench import load_queries as _lq

    return _lq(path)


def main() -> None:
    args = sys.argv[1:]
    # (path, per-sample excludes): an --exclude AFTER a --slow-sample
    # attaches to that sample; an --exclude BEFORE any sample is
    # global.  Per-sample matters because different recorded runs
    # predate different plan changes (e.g. the r13 driver run measured
    # the pre-fix q54 plan, while same-round session logs did not).
    slow_samples: list[tuple[str, set]] = []
    global_exclude: set[str] = set()
    logs: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--slow-sample":
            slow_samples.append((args[i + 1], set())); i += 2
        elif args[i] == "--exclude":
            excl = set(args[i + 1].split(","))
            if slow_samples:
                slow_samples[-1][1].update(excl)
            else:
                global_exclude |= excl
            i += 2
        else:
            logs.append(args[i]); i += 1
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
    # the band rule, in normalized space — the MIRROR of the raw rule:
    # bottom from the sessions, top from max(sessions, recorded driver
    # slow samples).  Even after dividing out the shared canary mode, a
    # driver run carries per-entry RESIDUAL spread (the mode's
    # multipliers are non-uniform); folding recorded driver samples
    # into the top keeps an unchanged entry from being re-flagged for
    # the same residual every round, while --exclude drops entries
    # whose plan changed since the sample (their old residual would be
    # a silent widening).
    slow_norm: dict[str, float] = {}
    for p, excl in slow_samples:
        q = load_queries(p)
        infl = sorted(q[c] / med[c] for c in cal["canaries"] if c in q)
        mid = len(infl) // 2
        m = infl[mid] if len(infl) % 2 else (infl[mid - 1] + infl[mid]) / 2
        for k, v in q.items():
            if k in excl or k in global_exclude:
                continue
            slow_norm[k] = max(slow_norm.get(k, 0.0), v / m)
    bands = {
        k: [
            round(0.85 * min(ns[k] for ns in norm_sessions if k in ns), 3),
            round(
                1.15
                * max(
                    max(ns[k] for ns in norm_sessions if k in ns),
                    slow_norm.get(k, 0.0),
                ),
                3,
            ),
        ]
        for k in keys
    }
    cal["session_median"] = med
    cal["bands_normalized"] = bands
    cal["pinned_from"] = ", ".join(os.path.basename(p) for p in logs) + (
        "; slow samples: "
        + ", ".join(
            os.path.basename(p)
            + (f" (excluded: {sorted(excl)})" if excl else "")
            for p, excl in slow_samples
        )
        + (f"; global excluded: {sorted(global_exclude)}"
           if global_exclude else "")
        if slow_samples
        else ""
    )
    with open(CAL_PATH, "w") as fh:
        json.dump(cal, fh, indent=1, sort_keys=True)
    print(f"pinned {len(med)} medians + bands from {len(logs)} sessions")


if __name__ == "__main__":
    main()
