"""Second microbench: dispatch overhead, big-n GEMM/POTRF."""
import time
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, reps=3):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


x = jnp.ones((8, 128), jnp.float32)
t = timeit(jax.jit(lambda v: jnp.sum(v)), x, reps=5)
print(f"dispatch overhead (tiny op): {t*1e3:.2f} ms", flush=True)

for n, dt, prec in [(16384, jnp.float32, "high"), (16384, jnp.float32, "highest"),
                    (32768, jnp.bfloat16, "default"), (32768, jnp.float32, "high")]:
    a = jax.random.normal(jax.random.PRNGKey(0), (n, n), dt)
    f = jax.jit(lambda x, y, prec=prec: jnp.sum(jnp.matmul(x, y, precision=prec)).astype(jnp.float32))
    t = timeit(f, a, a)
    print(f"GEMM n={n} {jnp.dtype(dt).name} {prec}: {t*1e3:.1f} ms {2*n**3/t/1e12:.1f} TF", flush=True)

import sys
sys.path.insert(0, "/root/repo")
import dlaf_tpu as dt_
from dlaf_tpu.matrix import generators as gen

for n, nb, prec in [(16384, 512, "high"), (32768, 512, "high")]:
    dt_.set_tune_parameters(matmul_precision=prec)
    a = gen.random_hermitian_positive_definite(jax.random.PRNGKey(1), n, jnp.float32)
    f = jax.jit(lambda x, nb=nb: jnp.sum(dt_.potrf(x, nb=nb)).astype(jnp.float32))
    t = timeit(f, a)
    print(f"POTRF n={n} nb={nb} f32/{prec}: {t*1e3:.1f} ms {(n**3/3)/t/1e12:.1f} TF", flush=True)
