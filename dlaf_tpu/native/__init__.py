"""ctypes bindings for the native host runtime (see dlaf_native.cpp).

Builds on first import if the shared library is missing (g++ is part of the
environment); every entry point has a pure-NumPy fallback so the package
works without a toolchain.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libdlaf_native.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                           capture_output=True, timeout=120)
        except Exception:
            return None
    try:
        _lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    return _lib


def available() -> bool:
    return _ensure_built() is not None


_I = ctypes.c_int64


def _ptr(a):
    return a.ctypes.data_as(ctypes.c_void_p)


def pack_local(g: np.ndarray, mb: int, nb: int, grid, rank, src=(0, 0)):
    """Global (m, n) row-major -> rank (p, q)'s ScaLAPACK local (col-major)."""
    from ..dist import index as ix
    m, n = g.shape
    P, Q = grid
    p, q = rank
    lm = int(ix.local_size(m, mb, P, p, src[0]))
    ln = int(ix.local_size(n, nb, Q, q, src[1]))
    loc = np.zeros((ln, lm), g.dtype).T  # column-major (lm, ln)
    lib = _ensure_built()
    sfx = {"float32": "f32", "float64": "f64"}.get(g.dtype.name)
    if lib is not None and sfx and g.flags.c_contiguous:
        fn = getattr(lib, f"pack_local_{sfx}")
        fn(_ptr(g), _I(m), _I(n), _I(mb), _I(nb), _I(P), _I(Q), _I(p), _I(q),
           _I(src[0]), _I(src[1]), _ptr(loc), _I(lm))
        return loc
    # fallback
    for gi in range(ix.ceil_div(m, mb)):
        if (gi + src[0]) % P != p:
            continue
        li = gi // P
        for gj in range(ix.ceil_div(n, nb)):
            if (gj + src[1]) % Q != q:
                continue
            lj = gj // Q
            blk = g[gi * mb:(gi + 1) * mb, gj * nb:(gj + 1) * nb]
            loc[li * mb:li * mb + blk.shape[0],
                lj * nb:lj * nb + blk.shape[1]] = blk
    return loc


def unpack_local(loc: np.ndarray, m: int, n: int, mb: int, nb: int,
                 grid, rank, out: np.ndarray, src=(0, 0)):
    """Inverse of pack_local, accumulating into ``out`` (m, n) row-major."""
    from ..dist import index as ix
    P, Q = grid
    p, q = rank
    lib = _ensure_built()
    sfx = {"float32": "f32", "float64": "f64"}.get(out.dtype.name)
    if lib is not None and sfx and out.flags.c_contiguous and loc.flags.f_contiguous:
        fn = getattr(lib, f"unpack_local_{sfx}")
        fn(_ptr(loc), _I(m), _I(n), _I(mb), _I(nb), _I(P), _I(Q), _I(p), _I(q),
           _I(src[0]), _I(src[1]), _ptr(out), _I(loc.shape[0]))
        return out
    for gi in range(ix.ceil_div(m, mb)):
        if (gi + src[0]) % P != p:
            continue
        li = gi // P
        for gj in range(ix.ceil_div(n, nb)):
            if (gj + src[1]) % Q != q:
                continue
            lj = gj // Q
            r1 = min((gi + 1) * mb, m) - gi * mb
            c1 = min((gj + 1) * nb, n) - gj * nb
            out[gi * mb:gi * mb + r1, gj * nb:gj * nb + c1] = \
                loc[li * mb:li * mb + r1, lj * nb:lj * nb + c1]
    return out


def band_to_tridiag_host(band_dense: np.ndarray, b: int):
    """CPU bulge-chasing band->tridiag with reflector recording.

    Same output contract as algos.eigensolver.band2tridiag.band_to_tridiag;
    the reference keeps this stage CPU-only by design
    (``band_to_tridiag/api.h:37-42``).
    """
    a = np.ascontiguousarray(band_dense).copy()
    n = a.shape[0]
    dt = a.dtype
    ncmax = max(-(-(n - 1) // b), 1)
    nsweeps = max(n - 2, 1)
    d = np.zeros(n, dt)
    e = np.zeros(max(n - 1, 1), dt)
    vs = np.zeros((nsweeps, ncmax, b), dt)
    taus = np.zeros((nsweeps, ncmax), dt)
    lib = _ensure_built()
    sfx = {"float32": "f32", "float64": "f64"}.get(dt.name)
    if lib is None or sfx is None:
        raise RuntimeError("native library unavailable; use the JAX path")
    fn = getattr(lib, f"band_to_tridiag_{sfx}")
    fn(_ptr(a), _I(n), _I(b), _ptr(d), _ptr(e), _ptr(vs), _ptr(taus), _I(ncmax))
    return d, e[: n - 1] if n > 1 else e[:0], vs, taus
