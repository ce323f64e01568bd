"""Parse miniapp CSVData-2 rows into a table + summary.

Analog of the reference's ``scripts/postprocess.py`` + ``plot_*.py`` pandas
pipeline: reads miniapp output (files or stdin), aggregates per-config
mean/best time and GFlop/s, optionally writes a matplotlib scaling plot.
"""
from __future__ import annotations

import argparse
import sys
from collections import defaultdict


def parse(lines):
    rows = []
    for ln in lines:
        if not ln.strip().startswith("CSVData-2"):
            continue
        f = [x.strip() for x in ln.split(",")]
        rows.append({
            "run": int(f[1]), "time": float(f[2]), "gflops": float(f[3]),
            "type": f[4], "uplo": f[5], "n": int(f[6]), "nb": int(f[7]),
            "grid": (int(f[8]), int(f[9])), "backend": f[11],
        })
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("files", nargs="*")
    p.add_argument("--plot", default=None, help="write scaling plot to file")
    args = p.parse_args()
    lines = []
    if args.files:
        for f in args.files:
            lines += open(f).readlines()
    else:
        lines = sys.stdin.readlines()
    rows = parse(lines)
    groups = defaultdict(list)
    for r in rows:
        groups[(r["type"], r["n"], r["nb"], r["grid"], r["backend"])].append(r)
    print(f"{'type':>4} {'n':>8} {'nb':>5} {'grid':>8} {'backend':>8} "
          f"{'best_t[s]':>10} {'mean_t[s]':>10} {'best_GF/s':>10}")
    results = []
    for key in sorted(groups):
        g = groups[key]
        bt = min(r["time"] for r in g)
        mt = sum(r["time"] for r in g) / len(g)
        bg = max(r["gflops"] for r in g)
        t, n, nb, grid, backend = key
        print(f"{t:>4} {n:>8} {nb:>5} {str(grid):>8} {backend:>8} "
              f"{bt:>10.4f} {mt:>10.4f} {bg:>10.1f}")
        results.append((key, bt, bg))
    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        by_n = defaultdict(list)
        for (t, n, nb, grid, backend), bt, bg in results:
            by_n[n].append((grid[0] * grid[1], bg))
        fig, ax = plt.subplots()
        for n, pts in sorted(by_n.items()):
            pts.sort()
            ax.plot([p[0] for p in pts], [p[1] for p in pts], "o-", label=f"n={n}")
        ax.set_xlabel("devices")
        ax.set_ylabel("GFlop/s")
        ax.set_xscale("log", base=2)
        ax.legend()
        fig.savefig(args.plot, dpi=120, bbox_inches="tight")
        print(f"plot written to {args.plot}")


if __name__ == "__main__":
    main()
