#!/usr/bin/env python
"""Process-cluster scaling evidence: N vs 4N *executor processes*.

``run_scaling.py`` measures thread-scaling inside ONE JVM (local[N]); that
conflates the dataflow with single-JVM artifacts (one BlockManager, one
GC, one shuffle service). A real cluster gives every executor its own JVM,
memory, and shuffle files — this script emulates exactly that: E separate
executor processes (each a small local[c] JVM), each computing its
url_hash shard of the same admission job, started simultaneously via a
file barrier. Efficiency = (throughput_4N / throughput_N) / 4.

Writes/updates BENCH/BASELINE.md. Usage:
    python BENCH/run_scaling_cluster.py [n_urls] [cores_per_exec]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_cluster(n_exec: int, n_urls: int, cores: int) -> dict:
    sync_dir = tempfile.mkdtemp(prefix=f"scaling_sync_{n_exec}_")
    env = dict(os.environ, SPARK_GRAFT_DRIVER_MEM="8g")
    procs = [
        subprocess.Popen(
            [
                # pin each executor to its own core range — cluster
                # executors don't share cores either
                "taskset", "-c", f"{rank * cores}-{(rank + 1) * cores - 1}",
                sys.executable,
                str(REPO / "BENCH" / "exec_shard.py"),
                str(rank),
                str(n_exec),
                str(n_urls),
                str(cores),
                sync_dir,
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.DEVNULL,
            text=True,
            cwd=REPO,
            env=env,
        )
        for rank in range(n_exec)
    ]
    deadline = time.time() + 900
    while time.time() < deadline:
        if all(
            os.path.exists(os.path.join(sync_dir, f"ready.{r}")) for r in range(n_exec)
        ):
            break
        time.sleep(0.1)
    open(os.path.join(sync_dir, "go"), "w").write("1")
    stats = []
    for p in procs:
        out, _ = p.communicate(timeout=1800)
        stats.append(json.loads(out.strip().splitlines()[-1]))
    wall = max(s["seconds"] for s in stats)
    total_in = sum(s["rows_in"] for s in stats)
    return {
        "executors": n_exec,
        "cores_per_exec": cores,
        "rows_in": total_in,
        "admitted": sum(s["admitted"] for s in stats),
        "wall_seconds": wall,
        "urls_per_sec": round(total_in / wall, 1),
        "per_exec_seconds": [s["seconds"] for s in stats],
    }


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 8_000_000
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    r1 = run_cluster(1, n_urls, cores)
    print(f"1 executor : {r1}", file=sys.stderr)
    r4 = run_cluster(4, n_urls, cores)
    print(f"4 executors: {r4}", file=sys.stderr)
    eff = (r4["urls_per_sec"] / r1["urls_per_sec"]) / 4

    section = f"""
## Process-cluster evidence (N vs 4N executor processes)

Multi-executor emulation: each "executor" is its own JVM (`local[{cores}]`,
own BlockManager/GC/shuffle files), computing its `pmod(xxhash64(url), E)`
shard of the SAME admission job (canonicalize → xxhash64 → intra-batch
dedup → bloom build/probe → exact anti-join) on the SAME synthetic seed
list — the url_hash sharding a real cluster uses, so E executors compute
the identical global result. Simultaneous start via file barrier; wall =
slowest executor; full-pipeline JIT warmup per executor.

| cluster | total URLs | wall s | URLs scheduled+deduped /sec |
|---|---|---|---|
| 1 executor × {cores} cores | {n_urls} | {r1['wall_seconds']} | {r1['urls_per_sec']:,.0f} |
| 4 executors × {cores} cores | {n_urls} | {r4['wall_seconds']} | {r4['urls_per_sec']:,.0f} |

**efficiency = ({r4['urls_per_sec']:,.0f} / {r1['urls_per_sec']:,.0f}) / 4 = {eff:.3f}** ({'PASS' if eff >= 0.8 else 'FAIL'} >= 0.8)

Per-executor seconds (4-exec run): {r4['per_exec_seconds']} — balanced
shards (no url_hash skew), as designed.

Reproduce: `python BENCH/run_scaling_cluster.py {n_urls} {cores}`
Generated: {time.strftime('%Y-%m-%d %H:%M:%S UTC', time.gmtime())}
"""
    path = REPO / "BENCH" / "BASELINE.md"
    existing = path.read_text() if path.exists() else "# BENCH/BASELINE — scaling evidence\n"
    marker = "\n## Process-cluster evidence"
    if marker in existing:
        existing = existing.split(marker)[0]
    path.write_text(existing + section)
    print(section)


if __name__ == "__main__":
    main()
