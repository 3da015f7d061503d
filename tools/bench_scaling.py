"""N-vs-4N scaling benchmark (BASELINE.md protocol).

Runs tools/bench_job.py at local[8] and local[32] in separate processes on
identical input and reports throughput + scaling efficiency
(= (T_32/T_8)/4, target >= 0.8). Writes BENCH/scaling.json.
"""

from __future__ import annotations

import json
import os
import pathlib
import subprocess
import sys

ROOT = pathlib.Path(__file__).resolve().parent.parent


def run(cores: int) -> dict:
    env = dict(os.environ, BENCH_CORES=str(cores))
    out = subprocess.run(
        [sys.executable, str(ROOT / "tools/bench_job.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    if out.returncode != 0:
        raise RuntimeError(out.stderr[-2000:])
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    r8 = run(8)
    r32 = run(32)
    result = {
        "local8": r8,
        "local32": r32,
        "frontier_scaling_efficiency": round(
            (r32["frontier_urls_per_s"] / r8["frontier_urls_per_s"]) / 4, 3
        ),
        "parse_scaling_efficiency": round(
            (r32["parse_msgs_per_s"] / r8["parse_msgs_per_s"]) / 4, 3
        ),
    }
    out = ROOT / "BENCH/scaling.json"
    out.parent.mkdir(exist_ok=True)
    out.write_text(json.dumps(result, indent=2))
    print(json.dumps(result))


if __name__ == "__main__":
    main()
