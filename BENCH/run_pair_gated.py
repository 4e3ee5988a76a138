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
    run local[2] arm (bench.py, frontier-only)   # + in-arm monitor
    run local[8] arm (back-to-back, same window) # + in-arm monitor
    calib2 = host_calibration()
    accept pair only if calib2 <= GATE           # window survived
           and in-arm median <= 1.5*GATE on BOTH arms
    stop after `max_pairs` accepted pairs or a pair with eff >= 0.8

The in-arm monitor (added after the 2026-08-19 12:31 UTC sample, where
all four boundary probes read healthy yet the hi arm ran 2.2x its
same-day healthy record): a daemon thread samples ``calib_probe_once``
every ~2s WHILE the arm's bench subprocess runs, so a co-tenant patch
confined entirely inside one arm's execution window can no longer slip
between boundary probes. Acceptance rule is pre-registered above; every
sample — accepted or rejected — is appended to
BENCH/pair_samples.jsonl with the in-arm stats embedded, and the table
in BENCH/BASELINE.md is updated by hand from that log.

Usage: python BENCH/run_pair_gated.py [n_urls] [max_minutes] [gate]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import threading
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from bench import calib_probe_once, host_calibration, host_calibration_mc  # noqa: E402

IN_ARM_MED_FACTOR = 1.5  # in-arm median must stay within 1.5x the gate


class ArmMonitor:
    """Samples the single-iteration calib probe every ``period`` seconds
    on a daemon thread while a measurement arm runs. One probe costs
    ~0.05s healthy on one of 32 cores — <3% of one core, invisible to a
    2- or 8-thread arm — but a co-tenant stealing cycles inflates it 3-5x
    (observed 0.24-0.36 during the 2026-08-19 flapping window)."""

    def __init__(self, period: float = 2.0):
        self._period = period
        self._stop = threading.Event()
        self.samples: list[float] = []
        self._t = threading.Thread(target=self._run, daemon=True)

    def _run(self) -> None:
        while not self._stop.is_set():
            self.samples.append(round(calib_probe_once(), 4))
            self._stop.wait(self._period)

    def __enter__(self) -> "ArmMonitor":
        self._t.start()
        return self

    def __exit__(self, *exc) -> None:
        self._stop.set()
        self._t.join(timeout=10)

    def stats(self) -> dict:
        s = sorted(self.samples)
        if not s:
            return {"n": 0, "med": None, "p90": None, "max": None}
        return {
            "n": len(s),
            "med": s[len(s) // 2],
            "p90": s[min(len(s) - 1, int(len(s) * 0.9))],
            "max": s[-1],
        }


def run_arm(cpus: int, n_urls: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        BENCH_FRONTIER_URLS=str(n_urls),
        BENCH_SKIP_QUERIES="1",
    )
    with ArmMonitor() as mon:
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
        "inrun": mon.stats(),
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
        inband = all(
            arm["inrun"]["med"] is not None
            and arm["inrun"]["med"] <= gate * IN_ARM_MED_FACTOR
            for arm in (lo, hi)
        )
        sample = {
            "ts": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
            "n_urls": n_urls,
            "calib_before": calib,
            "calib_mc_before": mc,
            "calib_after": calib2,
            "accepted": calib2 <= gate and inband,
            "inrun_inband": inband,
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
