"""Correctness validation on the real TPU chip (f32, Pallas leaf kernels)."""
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

dt.set_tune_parameters(matmul_precision="high", eigensolver_min_band=64,
                       default_block_size=256)

n = 2048
a = gen.random_hermitian_positive_definite(jax.random.PRNGKey(0), n, jnp.float32)
l = np.asarray(dt.potrf(a, nb=256))
res = np.max(np.abs(l @ l.T - np.asarray(a))) / n
print(f"potrf residual/n: {res:.2e} {'OK' if res < 5e-5 else 'FAIL'}", flush=True)

b = gen.random_general(jax.random.PRNGKey(1), (n, 512), jnp.float32)
x = np.asarray(dt.trsm(jnp.asarray(l), b, nb=256))
res = np.max(np.abs(l @ x - np.asarray(b))) / n
print(f"trsm residual/n: {res:.2e} {'OK' if res < 5e-5 else 'FAIL'}", flush=True)

h = gen.random_hermitian(jax.random.PRNGKey(2), 1024, jnp.float32)
t0 = time.perf_counter()
w, v = dt.eigh(h)
w, v = np.asarray(w), np.asarray(v)
t = time.perf_counter() - t0
hn = np.asarray(h)
ref = np.linalg.eigvalsh(hn)
lamerr = np.max(np.abs(w - ref))
orth = np.max(np.abs(v.T @ v - np.eye(1024)))
resid = np.max(np.abs(hn @ v - v * w[None, :]))
print(f"eigh n=1024 (compile+run {t:.0f}s): lamerr {lamerr:.2e} orth {orth:.2e} "
      f"res {resid:.2e} {'OK' if orth < 1e-3 and resid < 1e-2 else 'FAIL'}", flush=True)
