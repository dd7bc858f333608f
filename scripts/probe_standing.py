"""Standing hot-key/occupancy probe harness (VERDICT r10 item 3).

The r7/r8 hot-key probes were one-shot artifacts: an edit to the
market-basket, as-of/range, or LSH families today would NOT re-certify
their skew behavior — the probe scripts exist, but nothing re-runs
their contracts as a unit. This harness re-runs all three from their
COMMITTED entry points (each drives the exact production *_form /
tagging functions the registry queries call, and each self-asserts its
own loud contract) in one command and writes one combined artifact:

  python scripts/probe_standing.py PROBE_STANDING_r11.json

Each probe runs in its own subprocess (fresh JVM — the bench.py
--ref-only isolation pattern; the probes size their own Spark sessions
and the LSH arm holds a 10M x 16 matrix on the driver). A probe's
non-zero exit (its internal contract tripping) fails the harness; the
combined artifact records every probe's full result dict either way.

Scale knobs: SPARK_GRAFT_STANDING_SCALE (int, default 1) multiplies
the corpus sizes of the basket/asof probes, and
SPARK_GRAFT_STANDING_LSH_N (default 10_000_000) sets the LSH corpus —
pass smaller values for smoke runs; the committed artifact uses the
defaults (the r7/r8 contract sizes).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALE = os.environ.get("SPARK_GRAFT_STANDING_SCALE", "1")
LSH_N = os.environ.get("SPARK_GRAFT_STANDING_LSH_N", "10000000")

PROBES = [
    ("market_basket", ["scripts/probe_market_basket.py", SCALE]),
    ("asof_range", ["scripts/probe_asof_range.py", SCALE]),
    ("lsh", ["scripts/probe_lsh.py", LSH_N]),
]


def main() -> int:
    dest = sys.argv[1] if len(sys.argv) > 1 else None
    out: dict = {"scale": int(SCALE), "lsh_n": int(LSH_N), "probes": {}}
    env = dict(os.environ)
    env.setdefault("SPARK_DRIVER_MEMORY", "16g")
    failures: list[str] = []
    for name, argv in PROBES:
        t0 = time.perf_counter()
        proc = subprocess.run(
            [sys.executable] + argv,
            capture_output=True, text=True, timeout=5400,
            cwd=REPO, env=env,
        )
        rec: dict = {
            "rc": proc.returncode,
            "wall_s": round(time.perf_counter() - t0, 1),
        }
        # the probe prints its result dict as the last JSON line; JVM
        # warnings can share stdout, so scan from the end
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                rec["result"] = json.loads(line)
                break
            except ValueError:
                continue
        if proc.returncode != 0:
            rec["stderr_tail"] = proc.stderr[-1500:]
            failures.append(name)
        out["probes"][name] = rec
        print(f"# {name}: rc={proc.returncode} "
              f"{rec['wall_s']}s", file=sys.stderr, flush=True)
    out["failures"] = failures
    out["pass"] = not failures
    if dest:
        with open(dest, "w") as fh:
            json.dump(out, fh, indent=1)
            fh.write("\n")
    else:
        print(json.dumps(out, indent=1))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
