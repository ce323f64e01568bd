"""Component-level profile of POTRF on TPU: leaf chol, trsm, tri_inv."""
import time
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys
sys.path.insert(0, "/root/repo")
import dlaf_tpu as dt
from dlaf_tpu.matrix import generators as gen
from dlaf_tpu.ops.householder import tri_inv

OVH = None

def timeit(fn, *args, reps=5):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)

x = jnp.ones((8, 128), jnp.float32)
OVH = timeit(jax.jit(lambda v: jnp.sum(v)), x)
print(f"overhead: {OVH*1e3:.1f} ms", flush=True)

def report(name, t, flops=None):
    net = max(t - OVH, 1e-9)
    s = f"{name}: {t*1e3:.2f} ms (net {net*1e3:.2f})"
    if flops:
        s += f" {flops/net/1e12:.1f} TF"
    print(s, flush=True)

dt.set_tune_parameters(matmul_precision="high")

# leaf chol at various sizes, batched x32 to amortize
for nb in [128, 256, 512]:
    a = gen.random_hermitian_positive_definite(jax.random.PRNGKey(0), nb, jnp.float32)
    ab = jnp.broadcast_to(a, (32, nb, nb))
    f = jax.jit(lambda x: jnp.sum(jax.vmap(jax.lax.linalg.cholesky)(x)))
    t = timeit(f, ab)
    report(f"32x chol({nb}) xla", t)

# serial chain of 32 chols (dependency chain) — models the critical path
a512 = gen.random_hermitian_positive_definite(jax.random.PRNGKey(0), 512, jnp.float32)
def chain(x):
    def body(i, v):
        c = jax.lax.linalg.cholesky(v + 512*jnp.eye(512))
        return c @ c.T / 512 + 512*jnp.eye(512)
    return jnp.sum(jax.lax.fori_loop(0, 32, body, x))
t = timeit(jax.jit(chain), a512 + 512*jnp.eye(512))
report("serial 32x [chol(512)+gemm]", t)

# trsm: XLA triangular solve 512 x 16384
l = jnp.tril(gen.random_triangular(jax.random.PRNGKey(1), 512, jnp.float32))
b = jax.random.normal(jax.random.PRNGKey(2), (16384, 512), jnp.float32)
f = jax.jit(lambda ll, bb: jnp.sum(jax.lax.linalg.triangular_solve(
    ll, bb, left_side=False, lower=True, transpose_a=True)))
t = timeit(f, l, b)
report("xla trsm R 512x16384", t, 512*512*16384.)

# tri_inv then matmul approach
f2 = jax.jit(lambda ll, bb: jnp.sum(bb @ tri_inv(ll, True, 128).T))
t = timeit(f2, l, b)
report("tri_inv(512)+gemm 16384", t, 512*512*16384.)

# full potrf variants
for n, nb in [(16384, 256), (16384, 512), (16384, 1024)]:
    a = gen.random_hermitian_positive_definite(jax.random.PRNGKey(1), n, jnp.float32)
    f = jax.jit(lambda x, nb=nb: jnp.sum(dt.potrf(x, nb=nb)))
    t = timeit(f, a, reps=3)
    report(f"POTRF n={n} nb={nb}", t, n**3/3)

# gemm ceiling reference
g = jax.random.normal(jax.random.PRNGKey(3), (16384, 16384), jnp.float32)
f = jax.jit(lambda x: jnp.sum(jnp.matmul(x, x, precision="high")))
t = timeit(f, g)
report("GEMM 16384 high", t, 2*16384.**3)
