"""Smoke tests: every miniapp runs end-to-end with --check on tiny sizes
(the analog of the reference's miniapp CTest entries)."""
import importlib

import pytest

import dlaf_tpu

CASES = [
    ("miniapp_cholesky", ["-n", "96", "-b", "32", "--check", "--nruns", "1"]),
    ("miniapp_cholesky", ["-n", "64", "-b", "16", "--grid-rows", "2",
                          "--grid-cols", "2", "--check", "--nruns", "1"]),
    ("miniapp_triangular_solver", ["-n", "96", "-b", "32", "--check", "--nruns", "1"]),
    ("miniapp_triangular_multiplication", ["-n", "96", "-b", "32", "--check",
                                           "--nruns", "1"]),
    ("miniapp_gen_to_std", ["-n", "96", "-b", "32", "--check", "--nruns", "1"]),
    ("miniapp_eigensolver", ["-n", "64", "--band-size", "16", "--check",
                             "--nruns", "1"]),
    ("miniapp_gen_eigensolver", ["-n", "64", "--check", "--nruns", "1",
                                 "--type", "d"]),
    ("miniapp_reduction_to_band", ["-n", "64", "--band-size", "16", "--check",
                                   "--nruns", "1"]),
    ("miniapp_band_to_tridiag", ["-n", "64", "--band-size", "8", "--check",
                                 "--nruns", "1"]),
    ("miniapp_tridiag_solver", ["-n", "70", "--check", "--nruns", "1"]),
    ("miniapp_bt_band_to_tridiag", ["-n", "64", "--band-size", "8", "--nruns", "1"]),
    ("miniapp_bt_reduction_to_band", ["-n", "64", "--band-size", "16",
                                      "--nruns", "1"]),
    ("miniapp_communication", ["-n", "32", "--grid-rows", "2", "--grid-cols", "4",
                               "--nruns", "1"]),
    ("kernel_runner", ["--kernel", "potrf", "-b", "64", "--count", "4",
                       "--nruns", "1"]),
    ("kernel_runner", ["--kernel", "trsm", "-b", "64", "--count", "4",
                       "--nruns", "1"]),
]


@pytest.fixture(autouse=True)
def small_tune():
    dlaf_tpu.set_tune_parameters(eigensolver_min_band=8, default_block_size=16)
    yield
    dlaf_tpu.tune.reset_tune_parameters()


@pytest.mark.parametrize("mod,argv", CASES, ids=[f"{m}-{i}" for i, (m, _) in enumerate(CASES)])
def test_miniapp(mod, argv, capsys):
    m = importlib.import_module(f"dlaf_tpu.miniapps.{mod}")
    m.main(argv)
    out = capsys.readouterr().out
    if "--check" in argv:
        assert "PASSED" in out
    if mod not in ("miniapp_communication", "kernel_runner"):
        assert "CSVData-2" in out
    if mod == "kernel_runner":
        assert "us/tile" in out
