"""XLA flag sweep for the north-star serving graph.

XLA_FLAGS bind at process start, so unlike scripts/heads_ab_probe.py
this probe cannot interleave arms inside one process.  Instead it
subprocess-launches one bench per (flag-set, round) in A,B,...,A,B
rotation and reports per-arm medians — slow chip drift (the +-9%
single-shot spread documented in BENCH.md) hits every arm equally in
expectation, and medians over >=3 rounds separate effects >~5%.

Flags tried are the documented XLA:TPU serving levers:

- ``--xla_tpu_scoped_vmem_limit_kib``: the fusion scratch budget;
  larger values let the fuser keep conv producer/consumer chains in
  VMEM (v5e has 128 MiB; the default budget is far smaller).
- ``--xla_tpu_enable_latency_hiding_scheduler``: overlaps async copies
  with compute; mostly a collectives lever but also reorders HBM
  prefetches single-core.

Each arm runs ``bench.py [batch] --north-star`` in a subprocess with
the arm's XLA_FLAGS and parses the one-line JSON.

  python -m tauv_vision_tpu.scripts.xla_flags_probe [batch] [rounds]
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

import numpy as np

ARMS = {
    "baseline": "",
    "vmem64m": "--xla_tpu_scoped_vmem_limit_kib=65536",
    "vmem32m": "--xla_tpu_scoped_vmem_limit_kib=32768",
    "lhs": "--xla_tpu_enable_latency_hiding_scheduler=true",
}


def run_arm(flags: str, batch: int) -> float:
    env = dict(os.environ)
    if flags:
        env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "") + " " + flags).strip()
    repo = pathlib.Path(__file__).resolve().parents[2]
    out = subprocess.run(
        [sys.executable, str(repo / "bench.py"), str(batch), "--north-star"],
        capture_output=True, text=True, timeout=1800, env=env, cwd=repo,
    )
    for line in reversed(out.stdout.strip().splitlines()):
        if line.startswith("{"):
            return float(json.loads(line)["value"])
    raise RuntimeError(
        f"no JSON from arm {flags!r}: {out.stdout[-500:]} {out.stderr[-500:]}"
    )


def main() -> None:
    ints = [int(a) for a in sys.argv[1:] if a.isdigit()]
    batch = ints[0] if ints else 128
    rounds = ints[1] if len(ints) > 1 else 3

    results: dict[str, list[float]] = {k: [] for k in ARMS}
    for r in range(rounds):
        for name, flags in ARMS.items():
            fps = run_arm(flags, batch)
            results[name].append(fps)
            print({"round": r, "arm": name, "fps": round(fps, 1)},
                  flush=True)

    base = float(np.median(results["baseline"]))
    summary = {
        name: {
            "fps_median": round(float(np.median(v)), 1),
            "fps_all": [round(x, 1) for x in v],
            "vs_baseline_arm": round(float(np.median(v)) / base, 4),
        }
        for name, v in results.items()
    }
    print(json.dumps({"batch": batch, "rounds": rounds, "arms": summary}))


if __name__ == "__main__":
    main()
