"""Runtime-tunable parameters and the config override chain.

TPU-native analog of the reference's ``include/dlaf/tune.h:91-136`` +
``src/init.cpp:111-304`` config system: defaults live in a dataclass, each
field can be overridden by an environment variable ``DLAF_TPU_<NAME>`` and by
an explicit keyword to :func:`initialize` / :func:`set_tune_parameters`
(precedence: defaults < env < explicit, matching the reference's
defaults < ``DLAF_*`` env < ``--dlaf:*`` CLI chain).
"""
from __future__ import annotations

import dataclasses
import os
from typing import Optional

_ENV_PREFIX = "DLAF_TPU_"


@dataclasses.dataclass
class TuneParameters:
    # default tile/block size used by the LAPACK-flavored API when the caller
    # does not specify one (reference miniapps default nb=512; 256 maps two
    # 128x128 MXU tiles per side and is the fp32 sweet spot on v5e)
    default_block_size: int = 256
    # leaf size at which blocked recursions switch to a single-tile kernel
    leaf_block_size: int = 128
    # micro panel width inside the Pallas potrf leaf kernel
    potrf_panel_size: int = 8
    # distributed POTRF wide-panel width in ELEMENTS (rounded to a multiple
    # of Q tiles): the trailing update runs as one k = width GEMM per panel
    # (reference look-ahead panel, factorization/cholesky/impl.h:218-221)
    potrf_dist_panel_width: int = 2048
    # column chunks per wide distributed trailing update (staircase herk
    # approximation: computed area = 1/2 + 1/(2*chunks) of the rectangle;
    # more chunks waste fewer flops but add per-chunk dispatch/masking)
    potrf_dist_trail_chunks: int = 24
    # eigensolver: band size = smallest divisor of nb >= this (reference
    # include/dlaf/eigensolver/internal/get_band_size.h:20 and
    # tune.h eigensolver_min_band). 128 on TPU: the wavefront bulge chase is
    # iteration-latency-bound (~n^2/b windows), so a wider band is FASTER
    # through stage 2 (n=8192 eigh: 4.4s at 64 -> 3.1s at 128, same
    # residuals); 256 currently trips a Mosaic tiling limit in the kernel
    eigensolver_min_band: int = 128
    # group size for applying band->tridiag Householder reflectors to the
    # eigenvector matrix (reference tune.h:130; the reference's own scaling
    # runs set 128, gen_dlaf_strong-gpu.py:20-38 — measurably faster here too)
    bt_band_to_tridiag_hh_apply_group_size: int = 128
    # cap on the wavefront fusion factor of the streaming stage-4 apply
    # (ops/pallas/bt_apply.bt_apply_fused_pallas): k staggered reflector
    # groups share one read+write pass of the eigenvector matrix, cutting
    # the stage's HBM traffic ~k-fold; the effective k is
    # min(this, largest power of two whose fused kernel fits VMEM).
    # 1 disables fusion (single-group kernel). Reference analog: raising
    # bt_band_to_tridiag_hh_apply_group_size (tune.h:130) trades the same
    # traffic, but super-linearly in flops; the wavefront fusion is linear.
    # Default 8 (clamps to 4 at band=128 via the VMEM feasibility table);
    # on-chip A/B at n=8192 produced bit-identical eigenvectors for
    # kf in {1, 4, 8} with all residual gates passing.
    bt_apply_fuse_groups: int = 8
    # number of secular-equation (laed4) Newton iterations in the tridiagonal
    # divide & conquer merge (analog of tridiag_rank1_* tuning, tune.h:117-124)
    laed4_max_iter: int = 120
    # band->tridiag kernel selection: "auto" picks the Pallas wavefront
    # strip kernel on TPU for f32 (manual DMA windows, O(n*b) memory), the
    # batched dense pipelined kernel on CPU, and the sequential strip kernel
    # for f64-emulation/complex; "strips"/"pipelined"/"sequential" force one
    band_to_tridiag_kernel: str = "auto"
    # trailing-update kernel for the (upper) POTRF hot loop: "xla" (dot +
    # subtract, fused by XLA) or "pallas" (ops/pallas/trailing.py: one
    # VMEM accumulator for the three bf16 passes AND the C-subtract)
    potrf_trailing_kernel: str = "xla"
    # distributed stage-2 mode: "replicated" chases the whole O(n*b) band on
    # every device (lowest constant per chase: Pallas DMA kernel on the
    # chip); "pipelined" distributes the chase compute itself across devices
    # (wavefront schedule + 2-strip halo handoff over ICI, the reference's
    # SweepWorkerDist analog, band_to_tridiag/mc.h:568-661) — ~D/2x less
    # chase work per device, the right mode once stage 2 dominates at scale
    band_to_tridiag_dist_mode: str = "replicated"
    # matmul precision for f32 inputs: "default" (bf16 1-pass), "float32"
    # (bf16_3x) or "highest" (bf16_6x); LAPACK-grade residuals need >= float32
    matmul_precision: str = "float32"
    # debug dumps (reference tune.h:29-57 HDF5 debug switches)
    debug_dump_cholesky_data: bool = False
    debug_dump_eigensolver_data: bool = False
    debug_dump_path: str = "dlaf_tpu_dump"


def _coerce(val: str, typ):
    if typ is bool:
        return val.strip().lower() in ("1", "true", "yes", "on")
    return typ(val)


def _from_env(base: TuneParameters) -> TuneParameters:
    kw = {}
    for f in dataclasses.fields(TuneParameters):
        env = os.environ.get(_ENV_PREFIX + f.name.upper())
        if env is not None:
            kw[f.name] = _coerce(env, f.type if isinstance(f.type, type) else type(getattr(base, f.name)))
    return dataclasses.replace(base, **kw)


_params: Optional[TuneParameters] = None


def get_tune_parameters() -> TuneParameters:
    """Singleton accessor (reference ``getTuneParameters()``)."""
    global _params
    if _params is None:
        _params = _validate(_from_env(TuneParameters()))
    return _params


# string-valued knobs with a closed set of values: a typo must error, not
# silently select the default dispatch branch
_CHOICES = {
    "band_to_tridiag_kernel": {"auto", "strips", "pipelined", "sequential",
                               "pallas"},
    "band_to_tridiag_dist_mode": {"replicated", "pipelined"},
    "potrf_trailing_kernel": {"xla", "pallas"},
    "matmul_precision": {"default", "float32", "highest", "high"},
}


def _validate(params: TuneParameters) -> TuneParameters:
    for name, allowed in _CHOICES.items():
        v = getattr(params, name)
        if v not in allowed:
            raise ValueError(f"tune parameter {name}={v!r}: "
                             f"expected one of {sorted(allowed)}")
    return params


def set_tune_parameters(**overrides) -> TuneParameters:
    """Apply explicit overrides INCREMENTALLY on top of the current
    parameters (defaults < env < accumulated explicit overrides — the
    reference mutates its config singleton the same way,
    ``src/init.cpp:111-180``); use :func:`reset_tune_parameters` to drop
    all explicit overrides."""
    global _params
    base = get_tune_parameters()
    unknown = set(overrides) - {f.name for f in dataclasses.fields(TuneParameters)}
    if unknown:
        raise ValueError(f"unknown tune parameters: {sorted(unknown)}")
    _params = _validate(dataclasses.replace(base, **overrides))
    return _params


def reset_tune_parameters() -> None:
    global _params
    _params = None
