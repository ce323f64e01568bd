"""Verify TPU-optimized leaf kernels: correctness + POTRF throughput."""
import time
import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys
sys.path.insert(0, "/root/repo")
import dlaf_tpu as dt
from dlaf_tpu.matrix import generators as gen

def timeit(fn, *args, reps=4):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)

x = jnp.ones((8, 128), jnp.float32)
OVH = timeit(jax.jit(lambda v: jnp.sum(v)), x)
print(f"overhead {OVH*1e3:.1f} ms", flush=True)

dt.set_tune_parameters(matmul_precision="high")

# pallas potrf tile correctness on TPU
from dlaf_tpu.ops.pallas.potrf import potrf_tile
a = gen.random_hermitian_positive_definite(jax.random.PRNGKey(0), 256, jnp.float32)
l = np.asarray(potrf_tile(a))
res = np.max(np.abs(l @ l.T - np.asarray(a)))
print(f"pallas potrf_tile(256) residual: {res:.2e}", flush=True)

# full potrf correctness with new leaves
n = 4096
a = gen.random_hermitian_positive_definite(jax.random.PRNGKey(1), n, jnp.float32)
l = np.asarray(jax.jit(lambda x: dt.potrf(x, nb=256))(a))
res = np.max(np.abs(l @ l.T - np.asarray(a))) / n
print(f"potrf n=4096 residual/n: {res:.2e}", flush=True)

for n, nb in [(16384, 256), (16384, 512)]:
    a = gen.random_hermitian_positive_definite(jax.random.PRNGKey(1), n, jnp.float32)
    f = jax.jit(lambda x, nb=nb: jnp.sum(dt.potrf(x, nb=nb)))
    t = timeit(f, a)
    net = t - OVH
    print(f"POTRF n={n} nb={nb}: {t*1e3:.1f} ms (net {net*1e3:.1f}) {n**3/3/net/1e12:.1f} TF", flush=True)
