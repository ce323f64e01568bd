"""Microbenchmark: GEMM ceiling + recursive POTRF on the real TPU."""
import time

import jax
import jax.numpy as jnp
import numpy as np

assert jax.default_backend() != "cpu", jax.devices()


def timeit(f, *args, reps=3):
    r = f(*args)
    jax.block_until_ready(r)
    _ = np.asarray(r).ravel()[0]  # force full materialization through the relay
    ts = []
    for _i in range(reps):
        t0 = time.perf_counter()
        r = f(*args)
        jax.block_until_ready(r)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def bench_gemm(n, dtype, prec):
    k = jax.random.PRNGKey(0)
    a = jax.random.normal(k, (n, n), dtype)
    b = jax.random.normal(k, (n, n), dtype)
    f = jax.jit(lambda x, y: jnp.matmul(x, y, precision=prec))
    t = timeit(f, a, b)
    tf = 2 * n**3 / t / 1e12
    print(f"GEMM n={n} {jnp.dtype(dtype).name} prec={prec}: {t*1e3:.2f} ms  {tf:.1f} TFLOP/s", flush=True)


for prec in ["default", "high", "highest"]:
    bench_gemm(8192, jnp.float32, prec)
bench_gemm(8192, jnp.bfloat16, "default")

# recursive potrf
import sys
sys.path.insert(0, "/root/repo")
import dlaf_tpu as dt
from dlaf_tpu.matrix import generators as gen

for n, nb in [(8192, 128), (8192, 256), (8192, 512), (16384, 256)]:
    a = gen.random_hermitian_positive_definite(jax.random.PRNGKey(1), n, jnp.float32)
    f = jax.jit(lambda x, nb=nb: dt.potrf(x, nb=nb))
    t = timeit(f, a)
    tf = (n**3 / 3) / t / 1e12
    print(f"POTRF n={n} nb={nb} f32: {t*1e3:.2f} ms  {tf:.1f} TFLOP/s", flush=True)
