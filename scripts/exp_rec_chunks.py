"""A/B eigh_large rec_chunks (stage-4 re-chase count) on the real TPU.

Usage: python scripts/exp_rec_chunks.py [n] [chunks...]
Times eigh_large(a, rec_chunks=c) warm for each c, with on-device residual
gates, printing one JSON line per configuration.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import dlaf_tpu as dt
from dlaf_tpu.algos.eigensolver.large import eigh_large
from dlaf_tpu.matrix import generators as gen

_fence = jax.jit(lambda y: y.ravel()[-1])


def _sync(x):
    float(_fence(x))


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    chunks = [int(c) for c in sys.argv[2:]] or [1, 2]
    dt.set_tune_parameters(matmul_precision="high")
    eps32 = float(jnp.finfo(jnp.float32).eps)

    def mk_a():
        return gen.random_hermitian(jax.random.PRNGKey(3), n, jnp.float32)

    @jax.jit
    def probes(a, w, v):
        u = jax.random.normal(jax.random.PRNGKey(5), (n, 4), jnp.float32)
        u = u / jnp.linalg.norm(u, axis=0, keepdims=True)
        vu = jnp.matmul(v, u, precision="float32")
        orth = jnp.max(jnp.abs(jnp.matmul(v.T, vu, precision="float32") - u))
        resid = jnp.max(jnp.abs(jnp.matmul(a, vu, precision="float32")
                                - jnp.matmul(v, w[:, None] * u,
                                             precision="float32")))
        return orth, resid, jnp.maximum(jnp.max(jnp.abs(a)), 1.0)

    for c in chunks:
        try:
            a = mk_a()
            _sync(a)
            t0 = time.perf_counter()
            w, v, st = eigh_large(a, rec_chunks=c, timers=True)
            _sync(v)
            t_cold = time.perf_counter() - t0
            del w, v
            a = mk_a()
            _sync(a)
            t0 = time.perf_counter()
            w, v, st = eigh_large(a, rec_chunks=c, timers=True)
            _sync(v)
            t_warm = time.perf_counter() - t0
            a = mk_a()
            orth, resid, scale = (float(x) for x in probes(a, w, v))
            ok = orth <= 500 * n * eps32 and resid <= 1000 * n * eps32 * scale
            print(json.dumps({
                "n": n, "rec_chunks": c, "cold_s": round(t_cold, 2),
                "warm_s": round(t_warm, 3),
                "stages": {k: round(s, 3) for k, s in st.items()},
                "orth": orth, "res": resid, "gates": bool(ok)}), flush=True)
            del a, w, v
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"n": n, "rec_chunks": c,
                              "error": repr(exc)[:200]}), flush=True)
        jax.clear_caches()


if __name__ == "__main__":
    main()
