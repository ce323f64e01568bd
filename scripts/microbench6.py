"""POTRF with buffer donation + precision variants."""
import time
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys
sys.path.insert(0, "/root/repo")
import dlaf_tpu as dt
from dlaf_tpu.matrix import generators as gen

def timeit_scalar(fn, *args, reps=4):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)

x = jnp.ones((8, 128), jnp.float32)
OVH = timeit_scalar(jax.jit(lambda v: jnp.sum(v)), x)
print(f"overhead {OVH*1e3:.1f} ms", flush=True)

n = 16384
a = gen.random_hermitian_positive_definite(jax.random.PRNGKey(1), n, jnp.float32)

# donated in-place factorization
for prec in ["high", "default"]:
    dt.set_tune_parameters(matmul_precision=prec)
    f = jax.jit(lambda x, p=prec: jnp.sum(dt.potrf(x, nb=512)), donate_argnums=0)
    # warm
    float(f(jnp.array(a)))
    copies = [jnp.array(a) for _ in range(4)]
    jax.block_until_ready(copies)
    ts = []
    for c in copies:
        t0 = time.perf_counter()
        float(f(c))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    print(f"POTRF donated n={n} prec={prec}: {t*1e3:.1f} ms "
          f"(net {(t-OVH)*1e3:.1f}) {n**3/3/(t-OVH)/1e12:.1f} TF", flush=True)
