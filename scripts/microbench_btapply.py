"""Direct microbench of the streaming stage-4 apply kernels.

Times, on synthetic slabs (zero reflectors are arithmetic no-ops with
identical memory behavior):
  - k consecutive bt_apply_group_pallas calls (single-group kernel), vs
  - one bt_apply_fused_pallas call covering the same k groups,
isolating the E-pass traffic effect from the XLA slab-prep that the
eigh_large stage-4b timer lumps in.

Usage: python scripts/microbench_btapply.py [--nev 16384] [--b 128]
                                            [--k 4] [--reps 3]
"""
import argparse
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

_fence = jax.jit(lambda y: y.ravel()[-1])


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--nev", type=int, default=16384)
    ap.add_argument("--b", type=int, default=128)
    ap.add_argument("--k", type=int, default=4)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args(argv)
    nev, b, k = args.nev, args.b, args.k

    from dlaf_tpu.ops.pallas.bt_apply import (apply_tile,
                                              bt_apply_fused_pallas,
                                              bt_apply_group_pallas,
                                              fused_groups)
    tile = apply_tile(nev, b)
    kf = fused_groups(nev, b, tile)
    print(json.dumps({"tile": tile, "vmem_feasible_k": kf}), flush=True)
    n = nev
    nblk = n // b + 2
    ncmax = n // b
    ep = jax.jit(lambda: jnp.zeros((nblk * b, nev), jnp.float32))()
    v1 = jax.jit(lambda: jnp.zeros((ncmax, 2 * b, b), jnp.float32))()
    vk = jax.jit(lambda: jnp.zeros((ncmax, k, 2 * b, b), jnp.float32))()
    beta = jnp.int32(0)

    # --- k single-group passes (group bases beta .. beta+k-1) ------------
    @jax.jit
    def singles(ep):
        for j in range(k):
            base = k - 1 - j
            ncv = max(ncmax - base - 2, 1)
            ep = bt_apply_group_pallas(ep, v1, v1, jnp.int32(base),
                                       jnp.int32(ncv), b, tile)
        return ep

    # --- one fused pass ----------------------------------------------------
    @jax.jit
    def fused(ep):
        v0p = jnp.int32(max(ncmax - (k - 1) - 2, 1))
        return bt_apply_fused_pallas(ep, vk, vk, beta, jnp.int32(k), v0p,
                                     k, b, tile)

    out = {"nev": nev, "b": b, "k": k, "tile": tile}
    for name, fn in [("singles", singles), ("fused", fused)]:
        try:
            y = fn(ep)
            float(_fence(y))
            ts = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                y = fn(ep)
                float(_fence(y))
                ts.append(time.perf_counter() - t0)
            out[name + "_s"] = round(min(ts), 4)
        except Exception as exc:  # noqa: BLE001
            out[name + "_err"] = repr(exc)[:200]
    if "singles_s" in out and "fused_s" in out:
        out["speedup"] = round(out["singles_s"] / out["fused_s"], 2)
        gb = 2 * nblk * b * nev * 4 / 1e9
        out["singles_gbps"] = round(k * gb / out["singles_s"], 1)
        out["fused_gbps"] = round(gb / out["fused_s"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
