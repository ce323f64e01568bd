"""On-chip A/B of the wavefront-fused stage-4 apply (bt_apply_fuse_groups).

Runs eigh_large at --n with each fusion factor, reporting the stage-4
sub-splits (rechase vs apply) and a residual probe — the decision data for
the knob's default. The knob is read at trace time, so caches are cleared
between candidates.

Usage: python scripts/microbench_fused.py [--n 8192] [--band 128]
                                          [--kf 1,4,8]
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
    ap.add_argument("--n", type=int, default=8192)
    ap.add_argument("--band", type=int, default=128)
    ap.add_argument("--kf", default="1,4,8")
    args = ap.parse_args(argv)
    n, b = args.n, args.band

    import dlaf_tpu as dt
    from dlaf_tpu.algos.eigensolver.large import eigh_large
    from dlaf_tpu.matrix import generators as gen

    dt.set_tune_parameters(matmul_precision="high")
    eps32 = float(jnp.finfo(jnp.float32).eps)

    def mk_a():
        return gen.random_hermitian(jax.random.PRNGKey(2), n, jnp.float32)

    out = {"n": n, "band": b}
    for kf in [int(x) for x in args.kf.split(",")]:
        dt.set_tune_parameters(bt_apply_fuse_groups=kf)
        jax.clear_caches()      # knob is captured at trace time
        try:
            w, v, _ = eigh_large(mk_a(), band=b, timers=True)  # compile
            float(_fence(v))
            del w, v
            a = mk_a()
            float(_fence(a))
            t0 = time.perf_counter()
            w, v, stage_s = eigh_large(a, band=b, timers=True)
            float(_fence(v))
            wall = time.perf_counter() - t0

            @jax.jit
            def probes(a, w, v):
                u = jax.random.normal(jax.random.PRNGKey(5), (n, 4),
                                      jnp.float32)
                u = u / jnp.linalg.norm(u, axis=0, keepdims=True)
                vu = jnp.matmul(v, u, precision="float32")
                orth = jnp.max(jnp.abs(
                    jnp.matmul(v.T, vu, precision="float32") - u))
                resid = jnp.max(jnp.abs(
                    jnp.matmul(a, vu, precision="float32")
                    - jnp.matmul(v, w[:, None] * u, precision="float32")))
                return orth, resid

            a = mk_a()
            orth, resid = (float(x) for x in probes(a, w, v))
            ok = orth <= 500 * n * eps32 and resid <= 1000 * n * eps32
            out[f"kf{kf}"] = {
                "wall_s": round(wall, 3),
                "stages": {k: round(s, 3) for k, s in stage_s.items()},
                "orth": orth, "res": resid, "gates_pass": bool(ok)}
            del a, w, v
        except Exception as exc:  # noqa: BLE001
            out[f"kf{kf}"] = {"error": repr(exc)[:300]}
        print(json.dumps({f"kf{kf}": out[f"kf{kf}"]}), flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
