"""Matrix printing helpers.

Analog of the reference's ``matrix/print_numpy.h:116`` / ``print_csv.h:80``:
emit a (distributed) matrix as a numpy-parsable expression or CSV rows, for
debugging and test triage.
"""
from __future__ import annotations

import sys

import numpy as np


def _gather(a):
    if hasattr(a, "to_global"):
        return np.asarray(a.to_global())
    return np.asarray(a)


def print_numpy(a, name: str = "mat", file=None) -> None:
    """``name = np.array([...])`` — same contract as the reference's
    format_numpy printer."""
    file = file or sys.stdout
    arr = _gather(a)
    with np.printoptions(threshold=np.inf, linewidth=np.inf,
                         precision=None, floatmode="unique"):
        body = np.array2string(arr, separator=", ")
    print(f"{name} = np.array({body})", file=file)


def print_csv(a, file=None, sep: str = ",") -> None:
    file = file or sys.stdout
    arr = _gather(a)
    for row in np.atleast_2d(arr):
        print(sep.join(repr(x) for x in row), file=file)
