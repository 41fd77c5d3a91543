#!/usr/bin/env python3
"""Round-close bench artifact: run graft.Bench N times (default 3) and
write BENCH_close.json — median of totals + per-query MINS — so the
driver/judge can cross-check the one-shot per-round BENCH_r{N}.json
against a contention-robust aggregate (a single driver run can land on
a loaded box; r13's did, and its own suspect flag said so).

Usage: python3 scripts/bench_close.py [sf_dir] [runs] [out_json]
Env:   SPARK_GRAFT_CPUS (default 32) passed through to Bench.
"""
import json
import os
import statistics
import subprocess
import sys


def run_once(sf_dir: str, cpus: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=cpus)
    out = subprocess.run(
        ["sbt", "-batch", "runMain graft.Bench"],
        env=env, capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    for line in out.stdout.splitlines():
        line = line.strip()
        if line.startswith("[info] "):
            line = line[len("[info] "):]
        if line.startswith("{") and '"metric"' in line:
            return json.loads(line)
    sys.exit("no bench JSON line found; last output:\n" + out.stdout[-2000:])


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    out_path = sys.argv[3] if len(sys.argv) > 3 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_close.json")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    results = []
    for i in range(runs):
        r = run_once(sf_dir, cpus)
        print(f"[bench_close] run {i + 1}/{runs}: total {r['value']:.2f}s "
              f"suspect={r.get('suspect')} failed={r.get('failed')}",
              flush=True)
        results.append(r)
    names = list(results[0]["queries"].keys())
    artifact = {
        "metric": "bench_close",
        "runs": runs,
        "sf": results[0].get("sf"),
        "cpus": int(cpus),
        "totals": [round(r["value"], 3) for r in results],
        "total_median": round(statistics.median(
            [r["value"] for r in results]), 3),
        # Bench records -1.0 for a failed query; min over SUCCESSFUL
        # runs only (falls back to -1.0 when every run failed)
        "queries_min": {
            n: round(min(
                [r["queries"][n] for r in results if r["queries"][n] >= 0]
                or [-1.0]), 3)
            for n in names},
        "suspect_flags": [bool(r.get("suspect")) for r in results],
        "failed": sorted({q for r in results for q in r.get("failed", [])}),
    }
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=False)
        f.write("\n")
    print(f"[bench_close] wrote {out_path}: median "
          f"{artifact['total_median']}s over {artifact['totals']}")


if __name__ == "__main__":
    main()
