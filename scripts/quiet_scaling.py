"""Load-gated 8->32 scaling pairs (the round-2/3 measurement protocol).

The shared host swings +-30-100 % with co-tenant load and quiet windows last
minutes (BENCH.md); round 2 established that single corpus pairs inside one
gated window are the only defensible measurement. This script:

  1. polls the 1-minute loadavg until it drops under --gate (default 1.2);
  2. runs ONE pair — local[8] then local[32] — of the chosen experiment
     (pipeline headline on a corpus, or the pure mention kernel) in fresh
     subprocesses;
  3. records walls, throughputs, the loadavg before/after every point and the
     pair's efficiency to bench_artifacts/scaling_r3.jsonl;
  4. repeats until --max-pairs pairs or --max-wait-min of gate-waiting.

A pair is marked quiet=true only if ambient load stayed under the gate+1
envelope at both points' starts; interpret anything else as co-tenant noise.
Usage: python scripts/quiet_scaling.py [--corpus scale|bench|xl] [--kernel]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))


def run_point(cpus: str, data: Path, kernel: bool) -> dict:
    mode = "--kernel-only" if kernel else "--headline-only"
    load_before = os.getloadavg()[0]
    t0 = time.time()
    proc = subprocess.run(
        [sys.executable, str(ROOT / "bench.py"), mode, "--cpus", cpus, "--data", str(data)],
        capture_output=True,
        text=True,
        timeout=1800,
    )
    line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() else "{}"
    out = json.loads(line)
    out.update(
        cpus=int(cpus),
        load_before=round(load_before, 2),
        load_after=round(os.getloadavg()[0], 2),
        wall_total=round(time.time() - t0, 1),
        rc=proc.returncode,
    )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="scale", choices=["bench", "scale", "xl"])
    ap.add_argument("--kernel", action="store_true", help="mention-kernel pair instead of pipeline")
    ap.add_argument("--gate", type=float, default=1.2)
    ap.add_argument("--max-pairs", type=int, default=1)
    ap.add_argument("--max-wait-min", type=float, default=45.0)
    a = ap.parse_args()

    from bench import ensure_bench_data

    n_convs = {"bench": 3000, "scale": 12000, "xl": 48000}[a.corpus]
    data = ensure_bench_data(n_convs=n_convs, name=f"kg_{a.corpus}" if a.corpus != "bench" else "kg_bench")

    art = ROOT / "bench_artifacts" / "scaling_r5.jsonl"
    art.parent.mkdir(exist_ok=True)
    done = 0
    wait_deadline = time.time() + a.max_wait_min * 60
    while done < a.max_pairs and time.time() < wait_deadline:
        load = os.getloadavg()[0]
        if load >= a.gate:
            print(f"gate: load {load:.1f} >= {a.gate}, waiting...", flush=True)
            time.sleep(30)
            continue
        rec: dict = {
            "ts": time.time(),
            "experiment": "kernel" if a.kernel else "pipeline",
            "corpus": a.corpus,
            "points": {},
        }
        # 32 FIRST: the wide point is the noise-fragile one (co-tenant
        # contention hits exactly when the job goes wide — 8-core points are
        # stable under load across every recorded round), so it gets the
        # pristine window; the 8-core point runs second and inherits only our
        # own decaying loadavg ghost, which it is insensitive to.
        quiet = True
        for cpus in ("32", "8"):
            pt = run_point(cpus, data, a.kernel)
            rec["points"][cpus] = pt
            quiet = quiet and (cpus == "8" or pt["load_before"] < a.gate + 1.0)
        p8, p32 = rec["points"]["8"], rec["points"]["32"]
        tps_key = "turns_per_sec"
        if tps_key in p8 and tps_key in p32 and p8[tps_key]:
            rec["efficiency_8_to_32"] = round(p32[tps_key] / (4 * p8[tps_key]), 3)
        rec["quiet"] = quiet
        # Mid-run contention marker: the load gate only sees ambient load at
        # point START, so a co-tenant burst arriving DURING the 32-core run
        # slips through (r5 pairs with 22-45 s walls vs the 4 s clean norm).
        # For this embarrassingly-parallel fixed workload a 32-core run slower
        # than the same-input 8-core run is physically impossible without
        # external contention — mark such pairs, keep the record, retry.
        contended = bool(
            p8.get("elapsed_sec") and p32.get("elapsed_sec") and p32["elapsed_sec"] > p8["elapsed_sec"]
        )
        rec["contended"] = contended
        with art.open("a") as fh:
            fh.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)
        if not contended:
            done += 1
        else:
            print("pair contended (32-core wall > 8-core wall); retrying", flush=True)
    if done == 0:
        print(json.dumps({"gate_timeout": True, "minutes_waited": a.max_wait_min}), flush=True)


if __name__ == "__main__":
    main()
