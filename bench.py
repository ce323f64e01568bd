"""Headline benchmark orchestrator.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} (POTRF at
n = 32768 vs the measured GEMM ceiling at the same matmul precision, i.e.
fraction of practical MXU peak; BASELINE.md target >= 0.70), with HEEV etc.
under extra keys. The full result set is written to BENCH_EXTRA.json.

Each section runs in its OWN subprocess (scripts/bench_sections.py): the
parent never initializes JAX, so sections acquire and release the chip in
turn and one section's OOM/crash/timeout cannot poison the others
(round-3 failure mode: the n=32768 EVP OOM cascaded into the eigvalsh
fallback, BENCH_DIST refresh, and the kernel smoke). Sections checkpoint
their JSON incrementally, so even a timeout leaves a partial artifact.
The persistent compile cache (.jax_cache) is shared across sections.
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
SECTIONS_PY = os.path.join(REPO, "scripts", "bench_sections.py")

# (name, max share of the remaining budget, hard cap seconds)
PLAN = [
    ("potrf", 0.40, 900),
    ("heev", 0.30, 700),
    ("heev_big", 0.60, 1200),
    ("smoke", 0.20, 240),
    ("dist", 1.00, 900),
]
MIN_SECTION_S = 120


def run_section(name, budget_s):
    out_path = f"/tmp/dlaf_bench_{name}.json"
    try:
        os.remove(out_path)
    except FileNotFoundError:
        pass
    env = dict(os.environ, DLAF_BENCH_BUDGET_S=str(int(budget_s)))
    t0 = time.time()
    status = {}
    try:
        proc = subprocess.run(
            [sys.executable, SECTIONS_PY, name, out_path],
            capture_output=True, text=True, timeout=budget_s, env=env,
            cwd=REPO)
        if proc.returncode != 0:
            tail = (proc.stderr or "")[-800:]
            status["section_error"] = tail.strip().splitlines()[-3:]
    except subprocess.TimeoutExpired:
        status["section_timeout_s"] = round(budget_s, 1)
    status["wall_s"] = round(time.time() - t0, 1)
    try:
        with open(out_path) as f:
            data = json.load(f)
    except (FileNotFoundError, json.JSONDecodeError):
        data = {}
    data.update(status)
    return data


def main():
    budget = float(os.environ.get("DLAF_BENCH_BUDGET_S", "2400"))
    t_start = time.time()
    results = {}
    for name, share, cap in PLAN:
        remaining = budget - (time.time() - t_start)
        alloc = min(cap, max(remaining * share, MIN_SECTION_S))
        if remaining < MIN_SECTION_S:
            results[name] = {"skipped": "bench wall budget exhausted"}
            continue
        results[name] = run_section(name, alloc)

    potrf = results.get("potrf", {})
    line = {
        "metric": f"potrf_f32_n{potrf.get('n', 32768)}_tflops",
        "value": potrf.get("potrf_tflops"),
        "unit": "TFLOP/s",
        "vs_baseline": potrf.get("vs_baseline"),
        "heev": results.get("heev"),
        "heev_32768": results.get("heev_big"),
    }
    with open(os.path.join(REPO, "BENCH_EXTRA.json"), "w") as f:
        extra = {"potrf": potrf}
        extra.update({k: v for k, v in results.items() if k != "potrf"})
        json.dump(extra, f, indent=1)
        f.write("\n")
    print(json.dumps(line))


if __name__ == "__main__":
    main()
