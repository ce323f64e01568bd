"""Ablation: which part of recursive POTRF costs the extra time."""
import time
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys
sys.path.insert(0, "/root/repo")
import dlaf_tpu as dt
from dlaf_tpu.ops import blocked, leaf
from dlaf_tpu.matrix import generators as gen
from dlaf_tpu.ops.core import mm
from dlaf_tpu.types import Trans

def timeit(fn, *args, reps=3):
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)

x = jnp.ones((8, 128), jnp.float32)
OVH = timeit(jax.jit(lambda v: jnp.sum(v)), x)
dt.set_tune_parameters(matmul_precision="high")

n, nb = 16384, 512
a = gen.random_hermitian_positive_definite(jax.random.PRNGKey(1), n, jnp.float32)

def run(tag, salt):
    f = jax.jit(lambda x, s=salt: jnp.sum(dt.potrf(x, nb=nb)) + s)
    t = timeit(f, a)
    print(f"{tag}: {t*1e3:.1f} ms (net {(t-OVH)*1e3:.1f})", flush=True)

run("baseline", 0.0)

orig_potrf_leaf = leaf.potrf_leaf
orig_trsm_leaf = leaf.trsm_leaf
orig_herk = blocked.herk

# ablate leaf chol
blocked.potrf_leaf = lambda a: jnp.tril(a)
import dlaf_tpu.ops.blocked as bl
bl.potrf_leaf = lambda a: jnp.tril(a)
run("no-leaf-chol", 1.0)
bl.potrf_leaf = orig_potrf_leaf

# ablate trsm entirely (replace with equal-flop gemm)
orig_trsm = bl.trsm
bl.trsm = lambda b, a, **kw: mm(b, a)
run("trsm->gemm", 2.0)
bl.trsm = orig_trsm

# ablate herk (trailing): replace with beta*c only
bl_herk = bl.herk
def fake_herk(c, a, **kw):
    return c
bl.herk = fake_herk
run("no-herk", 3.0)
bl.herk = bl_herk

# pure-gemm equivalent flops: n^3/3 at this precision
g = jax.random.normal(jax.random.PRNGKey(3), (n, n // 3), jnp.float32)
f = jax.jit(lambda x: jnp.sum(jnp.matmul(x, x.T[:n // 3], precision="high")))
t = timeit(f, g)
print(f"gemm n x n/3: {t*1e3:.1f} ms (net {(t-OVH)*1e3:.1f})", flush=True)
