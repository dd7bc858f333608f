"""Container capability probe — the gate-burndown check VERDICT r7
item 5 asks for each round.

Two registry capabilities are container-gated, not code-gated:

- real image/audio decode in ``operators/multimodal.py`` (needs PIL or
  an audio codec lib; the Arrow plumbing around the gated decode is
  real and oracle-checked against deterministic fake featurizers),
- ``transformWithStateInPandas`` in ``streaming/stateful_v2.py``
  (Spark's TWS Python runner needs protobuf to ship state schemas).

If either library appears in a future container, the gated lanes are
promoted to oracle-backed registry entries; until then this probe
produces the committed PROBE_ENV_r{N}.json artifact proving the
absence is environmental, not a hidden stub.

Usage: python scripts/probe_env.py > PROBE_ENV_r08.json
"""

from __future__ import annotations

import importlib
import json
import sys

# module -> the registry capability it would unlock
_GATES = {
    "PIL": "multimodal real image decode (operators/multimodal.py)",
    "google.protobuf": (
        "transformWithStateInPandas end-to-end (streaming/stateful_v2.py)"
    ),
    "torch": "CUDA bucketize kernel branch (functions/udf_kernels.py)",
    "soundfile": "multimodal real audio decode (operators/multimodal.py)",
}


def probe() -> dict:
    out: dict[str, dict] = {"python": sys.version.split()[0], "gates": {}}
    for mod, unlocks in _GATES.items():
        try:
            m = importlib.import_module(mod)
            out["gates"][mod] = {
                "present": True,
                "version": getattr(m, "__version__", "unknown"),
                "unlocks": unlocks,
                "action": "PROMOTE the gated lane to an oracle-backed "
                          "registry entry this round",
            }
        except ImportError:
            out["gates"][mod] = {
                "present": False,
                "unlocks": unlocks,
                "action": "keep the documented gate",
            }
    out["any_promotable"] = any(
        g["present"] for g in out["gates"].values()
    )
    return out


if __name__ == "__main__":
    print(json.dumps(probe()))
