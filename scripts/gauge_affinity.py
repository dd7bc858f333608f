"""Generate scripts/gauge_affinity.json — the per-query gauge
classification bench_diff's two-gauge weather normalization reads
(VERDICT r10 item 5).

For every query appearing in the committed bench-disclosure series
alongside both calibration gauges, correlates the query's log-time
series with each gauge's log-time series across snapshots. The series
source is the git history of BENCH_LOCAL.json (every committed full
disclosure, ~3 per round since r4) — the driver's BENCH_r*.json
artifacts keep only a 2000-char stdout tail and are unusable here. A query is
assigned the gauge it tracks when the evidence is unambiguous:

- at least MIN_POINTS rounds of co-observation (cross-round variance is
  the signal; two points fit anything);
- Pearson r >= MIN_CORR against the winning gauge;
- the winning gauge beats the other by MIN_MARGIN (a lane that tracks
  both equally is really tracking "the host is slow" — the scalar
  median already handles that).

Everything else is omitted and falls back to bench_diff's median host
factor. The map is ADVISORY-ONLY input (bench_diff's exit code stays on
raw flags), so a misclassification can at worst mislabel a flag's
adjudication hint, never hide or invent an exit-code regression.

Code rewrites pollute a lane's series (the time change is the CODE, not
the host) — that noise pushes correlation DOWN, so rewritten lanes
naturally drop to the median fallback rather than misclassify.

Usage: python scripts/gauge_affinity.py   (writes gauge_affinity.json)
"""

from __future__ import annotations

import json
import math
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "scripts", "gauge_affinity.json")
GAUGES = ("calib_cpu_parallel", "calib_mem_bandwidth", "calib_disk_cold_read")
MIN_POINTS = 5
MIN_CORR = 0.5
MIN_MARGIN = 0.1


def _series() -> list[dict[str, float]]:
    import subprocess

    revs = subprocess.run(
        ["git", "-C", REPO, "log", "--format=%H", "--", "BENCH_LOCAL.json"],
        capture_output=True, text=True, check=True,
    ).stdout.split()
    snaps: list[dict[str, float]] = []
    seen: set[str] = set()
    for rev in revs:
        blob = subprocess.run(
            ["git", "-C", REPO, "show", f"{rev}:BENCH_LOCAL.json"],
            capture_output=True, text=True,
        ).stdout
        if not blob or blob in seen:  # dedupe commits that carried the
            continue                  # same disclosure forward unchanged
        seen.add(blob)
        try:
            doc = json.loads(blob)
        except ValueError:
            continue
        q = {
            k: float(v)
            for k, v in doc.get("queries", {}).items()
            if not isinstance(v, list) and isinstance(v, (int, float))
            and float(v) > 0
        }
        # co-observation is per gauge-pair below, so a snapshot only
        # needs SOME gauges — requiring all three would drop every
        # pre-r11 snapshot (none carries calib_disk_cold_read) and
        # silently regenerate an empty map (ADVICE r11)
        if sum(1 for g in GAUGES if g in q) >= 2:
            snaps.append(q)
    return snaps


def _pearson(xs: list[float], ys: list[float]) -> float:
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    sxx = sum((x - mx) ** 2 for x in xs)
    syy = sum((y - my) ** 2 for y in ys)
    if sxx <= 0 or syy <= 0:
        return 0.0
    return sxy / math.sqrt(sxx * syy)


def main() -> int:
    snaps = _series()
    names = sorted({n for q in snaps for n in q} - set(GAUGES))
    out: dict[str, dict] = {}
    for name in names:
        # per-pair co-observation: each gauge's correlation uses the
        # snapshots where BOTH the lane and THAT gauge were observed
        # (the disk gauge only exists from r11 on — ADVICE r11)
        corr: dict[str, float] = {}
        npts: dict[str, int] = {}
        for g in GAUGES:
            rows = [
                (math.log(q[name]), math.log(q[g]))
                for q in snaps
                if name in q and g in q
            ]
            npts[g] = len(rows)
            if len(rows) < MIN_POINTS:
                continue
            corr[g] = _pearson([r[0] for r in rows], [r[1] for r in rows])
        if len(corr) < 2:
            continue  # margin needs a runner-up; fall back to median
        best = max(corr, key=lambda g: corr[g])
        other = max((g for g in corr if g != best), key=lambda g: corr[g])
        if corr[best] >= MIN_CORR and corr[best] - corr[other] >= MIN_MARGIN:
            out[name] = {
                "gauge": best,
                "corr": round(corr[best], 3),
                "corr_other": round(corr[other], 3),
                "n": npts[best],
            }
    with open(OUT, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
        fh.write("\n")
    by_gauge = {g: sum(1 for r in out.values() if r["gauge"] == g)
                for g in GAUGES}
    print(
        f"{len(names)} lanes seen | {len(out)} classified "
        f"({by_gauge[GAUGES[0]]} cpu / {by_gauge[GAUGES[1]]} mem / "
        f"{by_gauge[GAUGES[2]]} disk) | "
        f"{len(names) - len(out)} median-fallback -> {OUT}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
