"""Weak/strong-scaling efficiency artifact on the virtual CPU device mesh.

The BASELINE contract asks for >= 75% weak-scaling efficiency 4 -> 64 chips
(reference harness: ``scripts/gen_dlaf_weak-gpu.py:25-41``). Real multi-chip
hardware is not reachable from this box (one tunneled TPU chip), so this
script runs the SAME sweep contract on the XLA virtual CPU mesh — it
exercises every distributed code path, the collective schedule, and the
n ∝ sqrt(D) weak-scaling size law end-to-end, and records per-mesh wall
times and parallel efficiencies. The numbers characterize the SPMD program
structure under emulation, NOT ICI hardware throughput — the artifact says
so in its own metadata.

All virtual devices timeshare ONE physical core here, so the classic
t(D0)/t(D) weak efficiency is meaningless (total work grows with D on
fixed silicon). The reported number is instead *work-normalized throughput
retention*: eff(D) = [flops(D)/t(D)] / [flops(1)/t(1)] — how much of the
1-device total throughput the increasingly-distributed SPMD program
retains. A program whose distribution machinery (collectives, masks,
padding) adds no overhead scores 1.0 at every D.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/bench_scaling.py [--base-n 2048] [--nb 256]

Writes WEAK_SCALING.json.
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, "/root/repo")

os.environ.setdefault("JAX_PLATFORMS", "cpu")

from dlaf_tpu.cache import cpu_cache_dir
import jax

jax.config.update("jax_platforms", "cpu")
# must be set BEFORE the backend initializes (any jax.devices() call);
# ineffective afterwards
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir",
                  cpu_cache_dir()
                  if os.environ.get("JAX_PLATFORMS") == "cpu"
                  else "/root/repo/.jax_cache")

import jax.numpy as jnp

import dlaf_tpu as dt
from dlaf_tpu.algos.cholesky import cholesky
from dlaf_tpu.comm.mesh import Grid
from dlaf_tpu.matrix import generators as gen
from dlaf_tpu.matrix.dist_matrix import DistMatrix

MESHES = [(1, 1), (1, 2), (2, 2), (2, 4)]


_REPS = 3


def _time(fn, reps=None):
    fn().data.block_until_ready()           # compile + warmup
    ts = []
    for _ in range(reps or _REPS):
        t0 = time.perf_counter()
        fn().data.block_until_ready()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _sweep(args, algo):
    from dlaf_tpu.algos.eigensolver.dist_driver import eigh_dist

    nb = args.nb
    points = []
    for (pr, pc) in MESHES:
        d = pr * pc
        if args.mode == "weak":
            n = args.base_n * math.sqrt(d)
            n = int(-(-n // nb)) * nb
        else:
            n = args.base_n
        grid = Grid((pr, pc), devices=jax.devices()[:d])
        if algo == "potrf":
            a = gen.random_hermitian_positive_definite(
                jax.random.PRNGKey(0), n, jnp.float32)
            dm = DistMatrix.from_global(a, nb, grid)
            t = _time(lambda: cholesky(dm))
            flops = n**3 / 3
            point = {"grid": [pr, pc], "devices": d, "n": n,
                     "seconds": round(t, 4),
                     "gflops": round(flops / t / 1e9, 2)}
        else:
            a = gen.random_hermitian(jax.random.PRNGKey(0), n, jnp.float32)
            dm = DistMatrix.from_global(a, nb, grid)
            flops = 10 * n**3 / 3      # ~red2band + chase + D&C + 2 BTs
            # A/B the distributed stage-2 mode (VERDICT r03 #5: the mode
            # choice must be evidence-based; reference scaling analog
            # band_to_tridiag/mc.h:568-661). On 1 device the pipelined
            # schedule degenerates to the replicated one — skip the B arm.
            mode_s = {}
            for dist_mode in (("replicated",) if d == 1
                              else ("replicated", "pipelined")):
                dt.set_tune_parameters(band_to_tridiag_dist_mode=dist_mode)
                mode_s[dist_mode] = round(_time(lambda: eigh_dist(dm)[1]), 4)
            dt.set_tune_parameters(band_to_tridiag_dist_mode="replicated")
            best = min(mode_s, key=mode_s.get)
            t = mode_s[best]
            point = {"grid": [pr, pc], "devices": d, "n": n,
                     "seconds": t, "gflops": round(flops / t / 1e9, 2),
                     "stage2_mode_seconds": mode_s, "stage2_best": best}
        points.append(point)
        print(algo, json.dumps(points[-1]), flush=True)

    base_thru = points[0]["gflops"]
    for p in points:
        p["throughput_retention_vs_1dev"] = round(p["gflops"] / base_thru, 4)
    return points


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base-n", type=int, default=2048)
    ap.add_argument("--eigh-base-n", type=int, default=1024)
    ap.add_argument("--nb", type=int, default=256)
    ap.add_argument("--eigh-nb", type=int, default=256)
    ap.add_argument("--mode", choices=["weak", "strong"], default="weak")
    ap.add_argument("--reps", type=int, default=3,
                    help="timed repetitions per point (min taken); 1 keeps "
                         "the 8-device eigh A/B inside a wall budget")
    args = ap.parse_args()
    global _REPS
    _REPS = args.reps

    points = _sweep(args, "potrf")
    eargs = argparse.Namespace(**vars(args))
    eargs.base_n, eargs.nb = args.eigh_base_n, args.eigh_nb
    epoints = _sweep(eargs, "eigh")

    out = {
        "mode": args.mode,
        "reps": args.reps,
        "environment": "virtual CPU device mesh (XLA host platform) — "
                       "exercises the SPMD/collective program structure, "
                       "NOT ICI hardware throughput",
        "potrf_f32": {"nb": args.nb, "points": points},
        "eigh_f32": {"nb": eargs.nb, "points": epoints},
    }
    path = "/root/repo/WEAK_SCALING.json" if args.mode == "weak" \
        else "/root/repo/STRONG_SCALING.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()


