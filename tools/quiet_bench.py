"""Quiet-window adjudication bench: fresh-JVM, cold + N warm executions
of a named headline subset at sf0.1, loadavg recorded around every timed
execution so the artifact self-annotates contention (the r4/r5
route_quiet / cuckoo_gate protocol). Usage:

    python tools/quiet_bench.py q1,q2,... [warm_reps]

Prints ONE line `QUIET_RESULT {json}` per invocation; run it >=3 times
(fresh JVM each) and keep the warm_min per run."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from crypto_msg_parser_spark.registry import all_queries  # noqa: E402
from crypto_msg_parser_spark.session import get_spark  # noqa: E402

SF = "/root/testdata/sf0.1"


def _load() -> str:
    return open("/proc/loadavg").read().split()[0]


def main() -> None:
    names = [s.strip() for s in sys.argv[1].split(",") if s.strip()]
    warm_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    qs = all_queries()
    spark = get_spark("quiet-bench", cores=32)
    spark.read.parquet(f"{SF}/lineitem.parquet").count()
    out: dict[str, dict] = {}
    for name in names:
        loads = [_load()]
        t0 = time.perf_counter()
        df = qs[name].spark_fn(spark, SF)
        df.write.format("noop").mode("overwrite").save()
        cold = round(time.perf_counter() - t0, 2)
        warms = []
        for _ in range(warm_reps):
            loads.append(_load())
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            warms.append(round(time.perf_counter() - t0, 2))
        loads.append(_load())
        out[name] = {
            "cold": cold,
            "warms": warms,
            "warm_min": min(warms),
            "loadavg": loads,
        }
    print("QUIET_RESULT " + json.dumps(out))


if __name__ == "__main__":
    main()
