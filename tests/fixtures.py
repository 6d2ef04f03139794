"""Deterministic reference-shaped telemetry fixtures (FIXTURES.md §A).

Generates the bronze ``telemetry_raw`` table with the exact pathologies the
reference's cleanup guards against: irregular distance spacing, duplicate
distances within a lap, NULL Speed/nGear/DRS/Compound/TyreLife, laps with
<10 samples, laps with max(Distance) < 2000, lowercase compounds, and one
lap-time outlier per round for the 107%-rule kill set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

COMPOUNDS = ["SOFT", "MEDIUM", "HARD", "soft", "INTERMEDIATE", None]


def gen_telemetry_raw(
    years=(2023, 2024),
    rounds=(1, 2),
    drivers=(1, 16, 44, 81),
    laps_per_driver: int = 6,
    seed: int = 42,
) -> pd.DataFrame:
    rng = np.random.default_rng(seed)
    rows = []
    for year in years:
        for rnd in rounds:
            track_len = float(rng.uniform(4200, 5800))
            for driver in drivers:
                for lap in range(1, laps_per_driver + 1):
                    # pathologies: lap 5 of driver[0] is short-sampled,
                    # lap 6 of driver[1] never leaves the pit (short extent)
                    if lap == 5 and driver == drivers[0]:
                        n = int(rng.integers(3, 9))
                        max_d = track_len
                    elif lap == 6 and driver == drivers[1]:
                        n = int(rng.integers(40, 60))
                        max_d = float(rng.uniform(500, 1800))
                    else:
                        n = int(rng.integers(80, 140))
                        max_d = track_len
                    steps = rng.uniform(2, 15, size=n)
                    dist = np.cumsum(steps)
                    dist = dist / dist[-1] * max_d
                    # inject duplicate distances (~3%)
                    dup_idx = rng.random(n) < 0.03
                    dist[dup_idx] = np.roll(dist, 1)[dup_idx]
                    base_lap_time = float(rng.uniform(80, 100))
                    # one slow outlier lap per round (107% kill set) and
                    # one absurdly short "lap time" (<50 s guard)
                    if lap == 4 and driver == drivers[2]:
                        base_lap_time *= 1.2
                    if lap == 3 and driver == drivers[3]:
                        base_lap_time = 30.0
                    t = np.sort(rng.uniform(0, base_lap_time, size=n))
                    t[0], t[-1] = 0.0, base_lap_time
                    speed = 150 + 120 * np.sin(dist / max_d * 6 * np.pi) + rng.normal(0, 5, n)
                    speed = np.clip(speed, 0, 360)
                    # NULL speed holes (~2%)
                    speed_null = rng.random(n) < 0.02
                    compound = COMPOUNDS[int(rng.integers(0, len(COMPOUNDS)))]
                    tyre_life = float(lap) if rng.random() > 0.1 else None
                    for i in range(n):
                        rows.append(
                            {
                                "Year": year,
                                "Round": rnd,
                                "Driver": driver,
                                "LapNumber": lap,
                                "Time": float(t[i]),
                                "Distance": float(dist[i]),
                                "Speed": None if speed_null[i] else float(speed[i]),
                                "RPM": float(4000 + speed[i] * 25),
                                "Throttle": float(np.clip(speed[i] / 3.6, 0, 100)),
                                "Brake": float(speed[i] < 120),
                                "nGear": None if rng.random() < 0.02 else float(min(8, 1 + speed[i] // 45)),
                                "DRS": None if rng.random() < 0.02 else float(rng.integers(0, 3)),
                                "Compound": compound,
                                "TyreLife": tyre_life,
                            }
                        )
    return pd.DataFrame(rows)


def gen_race_meta(years=(2023, 2024), rounds=(1, 2, 3)) -> pd.DataFrame:
    """Race metadata incl. one round (3) with no telemetry → MISSING path."""
    rows = []
    for y in years:
        for r in rounds:
            rows.append(
                {
                    "year": y,
                    "round": r,
                    "event_name": f"GP {y}-{r}",
                    "circuit": f"Circuit {r}",
                    "date": f"{y}-0{r}-01 00:00:00",
                }
            )
    return pd.DataFrame(rows)


def gen_live_decoded(
    n_seconds: int = 60, hz_tel: int = 60, hz_lap: int = 2, seed: int = 7
) -> pd.DataFrame:
    """Decoded live-telemetry stream records (FIXTURES §A5 decoded form):
    60 Hz telemetry rows interleaved with 2 Hz lap rows; the final lap is
    truncated mid-lap; one interval has only telemetry packets."""
    rng = np.random.default_rng(seed)
    rows = []
    t0 = 1_700_000_000.0
    lap = 1
    lap_dist = 0.0
    for i in range(n_seconds * hz_tel):
        ts = t0 + i / hz_tel + float(rng.normal(0, 1e-3))
        speed = float(200 + 80 * np.sin(i / 120))
        rows.append(
            {
                "Timestamp": ts,
                "packet": "telemetry",
                "Speed": speed,
                "Throttle": float(np.clip(speed / 3, 0, 100)),
                "Brake": float(speed < 150) * 100.0,
                "Gear": int(min(8, 1 + speed // 40)),
                "RPM": float(5000 + speed * 20),
                "Distance": None,
                "LapNumber": None,
            }
        )
    for i in range(n_seconds * hz_lap):
        # gap: no lap packets between seconds 20-30 (merge holds last value)
        sec = i / hz_lap
        if 20 <= sec < 30:
            continue
        lap_dist += 55.0
        if lap_dist > 1000:
            lap += 1
            lap_dist = 0.0
        rows.append(
            {
                "Timestamp": t0 + sec + 0.001,
                "packet": "lap",
                "Speed": None,
                "Throttle": None,
                "Brake": None,
                "Gear": None,
                "RPM": None,
                "Distance": lap_dist,
                "LapNumber": lap,
            }
        )
    df = pd.DataFrame(rows).sort_values("Timestamp").reset_index(drop=True)
    return df
