"""Quiet-window bench watcher.

The sandbox host's deliverable throughput drifts ~10x between windows
(BASELINE.md); the round-3 verdict asks for a scaling + headline sample
recorded in a window whose host-control ceiling is >= 0.8. This watcher
probes ``tools/host_control.py`` every ``--interval`` seconds and, when the
ceiling clears ``--threshold``, immediately runs the DRIVER-DEFAULT bench
(plain ``bench.py`` — the full headline suite, what the driver records as
BENCH_r{N}.json), then ``bench.py --scaling`` and ``bench.py --sustained``
back-to-back, appending each JSON line (probe history included) to
``--out``. ``--skip-headline`` restores the old scaling+sustained-only
capture. Exits after ``--max-hours`` or after
``--shots`` successful captures.

Run detached: ``nohup python tools/quiet_watch.py >/tmp/quiet_watch.log &``
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def probe() -> dict:
    from host_control import run_control

    return run_control(8, 32)


def run_bench(args: list[str]) -> dict | None:
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py"), *args],
        capture_output=True, text=True, cwd=REPO, timeout=2400,
    )
    if out.returncode != 0:
        return {"error": out.stderr[-2000:], "args": args}
    try:
        return json.loads(out.stdout.strip().splitlines()[-1])
    except Exception:
        return {"error": out.stdout[-2000:], "args": args}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--interval", type=float, default=240)
    ap.add_argument("--threshold", type=float, default=0.75)
    ap.add_argument("--max-hours", type=float, default=4.0)
    ap.add_argument("--shots", type=int, default=1)
    ap.add_argument("--skip-headline", action="store_true")
    ap.add_argument("--out", default="/tmp/quiet_bench.jsonl")
    args = ap.parse_args()

    t_end = time.time() + args.max_hours * 3600
    shots = 0
    while time.time() < t_end and shots < args.shots:
        p = probe()
        rec = {"t": time.strftime("%H:%M:%S"), "probe": p}
        print(json.dumps(rec), flush=True)
        if p["ceiling_efficiency"] >= args.threshold:
            headline = None if args.skip_headline else run_bench([])
            scaling = run_bench(["--scaling"])
            sustained = run_bench(["--sustained", "--multiplier", "960"])
            with open(args.out, "a") as f:
                f.write(json.dumps({"probe": p, "headline": headline,
                                    "scaling": scaling,
                                    "sustained": sustained}) + "\n")
            print("CAPTURED", flush=True)
            shots += 1
            continue
        time.sleep(args.interval)
    print("watcher done", flush=True)


if __name__ == "__main__":
    main()
