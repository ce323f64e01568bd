#!/bin/bash
# Per-stage TPU bisect with separate processes and full logs.
cd /root/repo
for stage in red2band b2t dc bt1 bt2; do
  echo "=== stage $stage ==="
  python - "$stage" << 'EOF'
import sys, time, jax, jax.numpy as jnp, numpy as np
stage = sys.argv[1]
jax.config.update('jax_compilation_cache_dir', '/root/repo/.jax_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 1.0)
sys.path.insert(0, '/root/repo')
import dlaf_tpu as dt
from dlaf_tpu.algos.eigensolver.red2band import reduction_to_band, extract_band
from dlaf_tpu.algos.eigensolver.band2tridiag import band_to_tridiag_pipelined
from dlaf_tpu.algos.eigensolver.tridiag_dc import tridiag_eigh
from dlaf_tpu.algos.eigensolver.bt import bt_band_to_tridiag, bt_reduction_to_band
from dlaf_tpu.matrix import generators as gen
dt.set_tune_parameters(matmul_precision='high')
n, b = 4096, 128
h = gen.random_hermitian(jax.random.PRNGKey(2), n, jnp.float32)
packed, taus1 = reduction_to_band(h, b)
print('red2band done', float(jnp.sum(taus1)), flush=True)
if stage == 'red2band':
    sys.exit(0)
band = extract_band(packed, b)
d, e, vs, t2 = band_to_tridiag_pipelined(band, b)
print('b2t done', float(jnp.sum(d)), flush=True)
if stage == 'b2t':
    sys.exit(0)
w, q = tridiag_eigh(jnp.real(d), jnp.real(e))
print('dc done', float(jnp.sum(w)), flush=True)
if stage == 'dc':
    sys.exit(0)
q = bt_band_to_tridiag(q.astype(jnp.float32), vs, t2, b)
print('bt1 done', float(jnp.sum(q)), flush=True)
if stage == 'bt1':
    sys.exit(0)
q = bt_reduction_to_band(q, packed, taus1, b)
print('bt2 done', float(jnp.sum(q)), flush=True)
EOF
  rc=$?
  echo "stage $stage rc=$rc"
  if [ $rc -ne 0 ]; then
    echo "FAILED AT $stage"
  fi
  sleep 20
done
