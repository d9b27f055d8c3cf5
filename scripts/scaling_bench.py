"""Two-parallelism scaling benchmark (the sandbox proxy for the
north_rule's N -> 4N executor criterion; see BASELINE.md).

Runs bench.py's headline frontier-round at local[8] and local[32] in
separate processes (fresh JVMs), reports URLs/sec at both plus the
scaling efficiency (thr_32 / thr_8) / 4, and appends the results to
BENCH/BASELINE.md.
"""

from __future__ import annotations

import datetime
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_at(cpus: int, n_urls: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["BENCH_QUERIES"] = "0"
    env["BENCH_FRONTIER_URLS"] = str(n_urls)
    env.setdefault("BENCH_STRATEGIES", "abucket")
    env.setdefault("BENCH_REPEAT", "3")  # best-of-3 (noisy shared host)
    cmd = [sys.executable, os.path.join(REPO, "bench.py")]
    # pin the N-core run to N hardware threads so its JVM/GC/shuffle
    # threads cannot poach the other 3N cores (fair N vs 4N comparison)
    if os.path.exists("/usr/bin/taskset"):
        cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
    out = subprocess.run(
        cmd,
        capture_output=True,
        text=True,
        env=env,
        timeout=1200,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main():
    n_urls = int(os.environ.get("BENCH_FRONTIER_URLS", 4_000_000))
    strategies = os.environ.get("BENCH_STRATEGIES", "bitword").split(",")
    runs = {}
    for cpus in (8, 32):
        # warm-up run then measured run, fresh JVM each
        runs[cpus] = run_at(cpus, n_urls)
        print(
            f"local[{cpus}]: {runs[cpus]['urls_per_sec_by_strategy']}", flush=True
        )
    result = {"n_urls": n_urls}
    for strat in strategies:
        thr8 = runs[8]["urls_per_sec_by_strategy"][strat]
        thr32 = runs[32]["urls_per_sec_by_strategy"][strat]
        result[strat] = {
            "urls_per_sec_local8": thr8,
            "urls_per_sec_local32": thr32,
            "scaling_efficiency_8_to_32": round((thr32 / thr8) / 4, 3),
        }
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    path = os.path.join(REPO, "BENCH", "BASELINE.md")
    stamp = datetime.datetime.now(datetime.timezone.utc).isoformat(timespec="seconds")
    header_needed = not os.path.exists(path)
    with open(path, "a") as f:
        if header_needed:
            f.write(
                "# BENCH/BASELINE — frontier-round scaling (N=8 vs 4N=32 cores)\n\n"
                "Sandbox proxy for the north_rule two-cluster-size criterion: the\n"
                "same frontier-round job (canonicalize -> xxhash64 -> bloom\n"
                "seen-filter cogroup -> robots gate -> salted politeness pop) on\n"
                "the same JVM-generated input at two parallelism levels.\n"
                "Efficiency = (thr_32 / thr_8) / 4; target >= 0.8.\n\n"
                "| when (UTC) | urls | urls/sec local[8] | urls/sec local[32] | efficiency |\n"
                "|---|---|---|---|---|\n"
            )
        for strat in strategies:
            r = result[strat]
            f.write(
                f"| {stamp} ({strat}) | {n_urls} | {r['urls_per_sec_local8']} "
                f"| {r['urls_per_sec_local32']} | {r['scaling_efficiency_8_to_32']} |\n"
            )


if __name__ == "__main__":
    main()
