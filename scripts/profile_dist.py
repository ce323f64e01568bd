"""Profile distributed-vs-local POTRF on the single chip and print the
top device ops of each, to localize the remaining dist/local overhead
(relayout copies, transposes, select/mask bandwidth, staircase waste).

Usage: python scripts/profile_dist.py [--n 32768] [--nb 512]
       [--trail-chunks N] [--kernel xla|pallas]

Writes traces under /tmp/dist_prof/{local,dist}/ and prints, per run:
wall time, then the top-20 device ops by summed duration.
"""
import argparse
import glob
import gzip
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import os

from dlaf_tpu.cache import cpu_cache_dir
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  cpu_cache_dir()
                  if os.environ.get("JAX_PLATFORMS") == "cpu"
                  else "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

_fence = jax.jit(lambda y: y.ravel()[-1])


def _sync(x):
    float(_fence(x))


def top_ops(trace_dir, k=20):
    """Sum device-op durations from the newest vm.trace.json.gz under
    trace_dir, filtered to the TPU device pid (the jit_ wrapper events
    overlap children; keep leaf ops only by dropping names starting with
    'jit_')."""
    paths = sorted(glob.glob(trace_dir + "/**/*.trace.json.gz",
                             recursive=True))
    if not paths:
        return None
    with gzip.open(paths[-1], "rt") as f:
        tr = json.load(f)
    ev = tr.get("traceEvents", [])
    dev_pids = {e["pid"] for e in ev
                if e.get("name") == "process_name" and
                "/device:TPU" in str(e.get("args", {}).get("name", ""))}
    tot, cnt = {}, {}
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        nm = e.get("name", "")
        if nm.startswith("jit_") or nm.startswith("Steal"):
            continue
        tot[nm] = tot.get(nm, 0.0) + e.get("dur", 0) / 1e3
        cnt[nm] = cnt.get(nm, 0) + 1
    rows = sorted(tot.items(), key=lambda kv: -kv[1])[:k]
    return [(nm, round(ms, 2), cnt[nm]) for nm, ms in rows]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=32768)
    ap.add_argument("--nb", type=int, default=512)
    ap.add_argument("--trail-chunks", type=int, default=None)
    ap.add_argument("--kernel", default=None, choices=["xla", "pallas"])
    ap.add_argument("--skip-local", action="store_true")
    args = ap.parse_args(argv)

    import dlaf_tpu as dt
    from dlaf_tpu.algos import cholesky as chol
    from dlaf_tpu.comm.mesh import Grid
    from dlaf_tpu.matrix import generators as gen
    from dlaf_tpu.matrix.dist_matrix import DistMatrix
    from dlaf_tpu.tune import get_tune_parameters

    dt.set_tune_parameters(matmul_precision="high")
    if args.trail_chunks is not None:
        dt.set_tune_parameters(potrf_dist_trail_chunks=args.trail_chunks)
    if args.kernel is not None:
        dt.set_tune_parameters(potrf_trailing_kernel=args.kernel)
    tune = get_tune_parameters()
    print(f"tune: kernel={tune.potrf_trailing_kernel} "
          f"chunks={tune.potrf_dist_trail_chunks} "
          f"panel_width={tune.potrf_dist_panel_width}", flush=True)

    n, nb = args.n, args.nb
    tiny = jnp.ones((8, 128), jnp.float32)
    _sync(tiny)
    ts = []
    for _ in range(5):
        t0 = time.perf_counter()
        _sync(tiny)
        ts.append(time.perf_counter() - t0)
    ovh = min(ts)

    def timed(fn, mk_in, label, trace_dir):
        # warm (compile), then 2 timed reps, then one traced rep; the input
        # is regenerated on device outside the timed region (donation)
        x = mk_in()
        _sync(x)
        y = fn(x)
        _sync(y)
        del y, x
        best = 1e9
        for _ in range(2):
            x = mk_in()
            _sync(x)
            t0 = time.perf_counter()
            y = fn(x)
            _sync(y)
            best = min(best, time.perf_counter() - t0 - ovh)
            del y, x
        x = mk_in()
        _sync(x)
        with jax.profiler.trace(trace_dir):
            y = fn(x)
            _sync(y)
        del y, x
        print(f"{label}: {best:.4f} s", flush=True)
        return best

    res = {}
    if not args.skip_local:
        mk = jax.jit(lambda: gen.random_hermitian_positive_definite(
            jax.random.PRNGKey(0), n, jnp.float32))
        loc_fn = jax.jit(lambda x: dt.potrf(x, uplo="U", nb=nb, clean=False),
                         donate_argnums=0)
        res["local"] = timed(loc_fn, mk, "local potrf U",
                             "/tmp/dist_prof/local")
        del mk, loc_fn

    from dlaf_tpu.dist import Distribution
    grid = Grid((1, 1))
    dist = Distribution((n, n), (nb, nb), grid.grid_size)
    # input generated directly in the factorization's preferred shard layout
    # (bench_dist contract): cholesky then runs copy-free I/O
    mk4 = jax.jit(lambda: gen.random_hermitian_positive_definite(
        jax.random.PRNGKey(0), n, jnp.float32)[None, None],
        out_shardings=chol.preferred_format(grid))

    def dist_fn(d):
        return chol.cholesky(DistMatrix(d, dist, grid), donate=True).data

    res["dist"] = timed(dist_fn, mk4, "dist potrf 1x1", "/tmp/dist_prof/dist")
    if "local" in res:
        print(f"dist/local = {res['dist'] / res['local']:.3f}", flush=True)

    for label in ("local", "dist"):
        if label == "local" and args.skip_local:
            continue
        rows = top_ops(f"/tmp/dist_prof/{label}")
        print(f"--- top ops: {label}")
        for nm, ms, c in rows or []:
            print(f"{ms:10.2f} ms  x{c:<5d} {nm}")


if __name__ == "__main__":
    main()
