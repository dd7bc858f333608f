"""Per-query bench regression check — the mechanical form of the
"zero regressions >20%" discipline VERDICT r7 graded.

Compares two bench JSON lines (e.g. the fresh BENCH_LOCAL.json vs the
committed BENCH_r07.json), prints every query slower than THRESHOLD x
the old time, and exits non-zero if any exceed it — so "regression
check done" is a command with an exit code, not prose. Sub-second
entries are exempt below ABS_FLOOR seconds of absolute growth (noise:
JVM warmup order, first-touch page cache); calibration probes and
best-of-N lists are skipped.

Usage: python scripts/bench_diff.py OLD.json NEW.json [threshold]
"""

from __future__ import annotations

import json
import statistics
import sys

THRESHOLD = 1.2
ABS_FLOOR = 0.4  # ignore regressions smaller than this in absolute s
SKIP = {"calib_cpu_parallel", "calib_mem_bandwidth"}


def load(path: str) -> dict[str, float]:
    with open(path) as fh:
        doc = json.load(fh)
    out = {}
    for k, v in doc.get("queries", {}).items():
        if k in SKIP or isinstance(v, list):
            continue
        out[k] = float(v)
    return out


def main(argv: list[str]) -> int:
    old_path, new_path = argv[0], argv[1]
    threshold = float(argv[2]) if len(argv) > 2 else THRESHOLD
    old, new = load(old_path), load(new_path)
    shared = sorted(set(old) & set(new))
    regressions = []
    improved = 0
    for name in shared:
        ratio = new[name] / max(old[name], 1e-9)
        if ratio > threshold and new[name] - old[name] > ABS_FLOOR:
            regressions.append((name, old[name], new[name], ratio))
        elif ratio < 1 / threshold:
            improved += 1
    print(
        f"{len(shared)} shared queries | {improved} improved >"
        f"{round((1 - 1 / threshold) * 100)}% | "
        f"{len(regressions)} regressed >{round((threshold - 1) * 100)}%"
    )
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print(f"dropped from new: {only_old}")
    if only_new:
        print(f"new entries: {only_new}")
    for name, o, n, r in sorted(regressions, key=lambda t: -t[3]):
        print(f"  REGRESSED {r:.2f}x  {name}: {o:.2f}s -> {n:.2f}s")
    # Weather-normalized ADVISORY view (r9: three same-HEAD runs flagged
    # 30/28/10 DIFFERENT entries on a host whose gauges drifted 10-44%):
    # the median new/old ratio across all shared queries is a robust
    # global host factor; a flag that survives dividing it out is a
    # code-shaped regression worth solo adjudication, the rest are
    # weather. Advisory only — the exit code stays on the raw flags.
    if regressions:
        # Median over NON-regressed shared queries only: if a code change
        # regresses a large fraction of entries, including them would fold
        # the regression into the "host factor" and the advisory view
        # would launder it as weather.
        flagged = {name for name, *_ in regressions}
        clean = [
            new[n] / max(old[n], 1e-9) for n in shared if n not in flagged
        ]
        if clean:
            w = statistics.median(clean)
        else:
            # every shared query tripped the raw flag: no unbiased anchor
            # exists, so attribute only the SMALLEST ratio to weather — a
            # full-set median would land inside the regressed mass and
            # launder a broad code regression as weather (closing-review
            # fix; a truly uniform slowdown still normalizes away, which
            # is the irreducible ambiguity of a single-host diff)
            w = min(new[n] / max(old[n], 1e-9) for n in shared)
        # floor applies to NORMALIZED growth (n/w - o): using raw
        # (n - o*w) would shrink the effective floor by 1/w on a slow
        # host — re-flagging exactly the weather noise this view exists
        # to suppress
        survive = [
            (name, o, n, r / w)
            for name, o, n, r in regressions
            if r / w > threshold and (n / w - o) > ABS_FLOOR
        ]
        print(
            f"weather factor (median ratio): {w:.2f}x | "
            f"{len(survive)} flags survive normalization:"
        )
        for name, o, n, r in sorted(survive, key=lambda t: -t[3]):
            print(f"  CODE-SHAPED {r:.2f}x  {name}: {o:.2f}s -> {n:.2f}s")
    return 1 if regressions else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
