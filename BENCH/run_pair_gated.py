#!/usr/bin/env python
"""Calibration-gated N→4N thread-pair sampler (north-rule evidence).

The sandbox VM has co-tenancy windows that swing same-binary throughput
2-20x for minutes at a time (BENCH/BASELINE.md round-4/5 notes), so
un-gated sweeps routinely land one arm in a sick window and report a
bogus efficiency. This runner only fires a pair when the host measures
HEALTHY, and only accepts the pair if the host still measures healthy
after both arms:

  loop:
    calib = host_calibration()          # single-core probe, healthy ~0.05
    if calib > GATE: sleep 60; continue
    run local[2] arm (bench.py, frontier-only)
    run local[8] arm (back-to-back, same window)
    calib2 = host_calibration()
    accept pair only if calib2 <= GATE  # window survived both arms
    stop after `max_pairs` accepted pairs or a pair with eff >= 0.8

Each accepted sample appends one JSON line to BENCH/pair_samples.jsonl
(urls/sec per arm, efficiency, before/after calib) — the table in
BENCH/BASELINE.md is updated by hand from that log.

Usage: python BENCH/run_pair_gated.py [n_urls] [max_minutes] [gate]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bench import host_calibration, host_calibration_mc  # noqa: E402


def run_arm(cpus: int, n_urls: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_FRONTIER_URLS=str(n_urls),
        BENCH_SKIP_QUERIES="1",
    )
    out = subprocess.run(
        [sys.executable, str(REPO / "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        timeout=3000,
        cwd=REPO,
    )
    d = json.loads(out.stdout.strip().splitlines()[-1])
    return {
        "cpus": cpus,
        "seconds": d["frontier"]["seconds"],
        "urls_per_sec": d["frontier"]["urls_per_sec"],
        "calib": d.get("host_calib_sec"),
        "calib_mc": d.get("host_calib_mc_sec"),
    }


def main() -> None:
    n_urls = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    max_minutes = float(sys.argv[2]) if len(sys.argv) > 2 else 120.0
    gate = float(sys.argv[3]) if len(sys.argv) > 3 else 0.08
    log = REPO / "BENCH" / "pair_samples.jsonl"
    deadline = time.time() + max_minutes * 60
    accepted = 0
    while time.time() < deadline:
        calib = host_calibration()
        mc = host_calibration_mc()
        stamp = time.strftime("%H:%M:%S", time.gmtime())
        if calib > gate:
            print(f"{stamp} gate closed: calib {calib} mc {mc}", flush=True)
            time.sleep(60)
            continue
        print(f"{stamp} gate OPEN (calib {calib} mc {mc}) — firing pair", flush=True)
        lo = run_arm(2, n_urls)
        hi = run_arm(8, n_urls)
        calib2 = host_calibration()
        eff = (hi["urls_per_sec"] / lo["urls_per_sec"]) / 4
        sample = {
            "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "n_urls": n_urls,
            "calib_before": calib,
            "calib_mc_before": mc,
            "calib_after": calib2,
            "accepted": calib2 <= gate,
            "lo": lo,
            "hi": hi,
            "efficiency_2_to_8": round(eff, 3),
        }
        with open(log, "a") as f:
            f.write(json.dumps(sample) + "\n")
        print(json.dumps(sample), flush=True)
        if sample["accepted"]:
            accepted += 1
            if eff >= 0.8:
                print("PASS pair captured — stopping.", flush=True)
                return
            if accepted >= 6:
                print("6 accepted pairs without a PASS — stopping.", flush=True)
                return


if __name__ == "__main__":
    main()
