"""ctypes wrapper over the REFERENCE iSWIFT solver — cross-validation only.

Builds (once, on demand) a shared library from the *unmodified* reference C
sources (`/root/reference/optimization/iSWIFT/`: `src/Prime.c:35,127,236`,
`src/Auxilary.c`, `ldl/src/ldl.c`, `src/timer.c`) plus srbx's own dense
bridge (`native/iswift_bridge.c`), and exposes one function:

    solve(P, c, A, b, G, h) -> (x, y, z, exit_code, iters)

This is the strongest reference-parity oracle available in this
environment: the exact QP instances srbx assembles (NMPC template QPs from
`srbx.ocp`, low-level QPs from `srbx.lowlevel`) are handed to the solver
the reference actually ships (f64, MAXIT 25, RELTOL/ABSTOL 1e-6 —
`optimization/iSWIFT/include/GlobalOptions.h:23-26`) and the solutions are
diffed against `srbx.ops.qp`.  See tests/test_iswift_parity.py and
docs/ROUND4.md.

The reference tree is read-only; compilation is out-of-tree (objects and
the .so land in native/build/).  Never imported by any production path.
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

import numpy as np

_REF = pathlib.Path("/root/reference/optimization/iSWIFT")
_REPO = pathlib.Path(__file__).resolve().parents[2]
_BUILD = _REPO / "native" / "build"
_SO = _BUILD / "libiswift_ref.so"

_lib = None


def available() -> bool:
    return _REF.is_dir()


def _build():
    _BUILD.mkdir(parents=True, exist_ok=True)
    srcs = [
        str(_REPO / "native" / "iswift_bridge.c"),
        str(_REF / "src" / "Prime.c"),
        str(_REF / "src" / "Auxilary.c"),
        str(_REF / "src" / "timer.c"),
        str(_REF / "ldl" / "src" / "ldl.c"),
    ]
    cmd = [
        "gcc", "-O2", "-fPIC", "-shared", "-w",
        f"-I{_REF / 'include'}",
        f"-I{_REF / 'ldl' / 'include'}",
        *srcs,
        "-o", str(_SO), "-lm",
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not _SO.exists():
        _build()
    lib = ctypes.CDLL(str(_SO))
    dp = ctypes.POINTER(ctypes.c_double)
    ip = ctypes.POINTER(ctypes.c_int)
    lib.iswift_solve_dense.restype = ctypes.c_int
    lib.iswift_solve_dense.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
        dp, dp, dp, dp, dp, dp, ctypes.c_double,
        dp, dp, dp, ip,
    ]
    _lib = lib
    return lib


def solve(P, c, A, b, G, h, sigma_d: float = 0.0):
    """Solve min x'Px + c'x s.t. Ax=b, Gx<=h with the reference solver.

    Cost convention: the Prime.c banner says "x'Px + c'x" but the
    stationarity residual is rx = Px + A'y + G'z + c (Auxilary.c:524-536),
    i.e. the solver actually minimizes ½ x'Px + c'x — the same convention
    as srbx.ops.qp, so matrices assembled by srbx.ocp / srbx.lowlevel can
    be passed to both solvers unchanged.

    Returns (x, y, z, exit_code, iters): primal, eq duals, ineq duals,
    iSWIFT exit code (0 optimal / 1 kktfail / 2 maxit / 3 fatal), and the
    iteration count.
    """
    lib = _load()
    P = np.ascontiguousarray(P, dtype=np.float64)
    c = np.ascontiguousarray(c, dtype=np.float64).ravel()
    G = np.ascontiguousarray(G, dtype=np.float64)
    h = np.ascontiguousarray(h, dtype=np.float64).ravel()
    n = P.shape[0]
    m = G.shape[0]
    if A is None or (hasattr(A, "size") and np.size(A) == 0):
        p = 0
        A = np.zeros((0, n))
        b = np.zeros((0,))
    else:
        A = np.ascontiguousarray(A, dtype=np.float64)
        b = np.ascontiguousarray(b, dtype=np.float64).ravel()
        p = A.shape[0]
    assert P.shape == (n, n) and G.shape == (m, n) and A.shape == (p, n)
    assert c.shape == (n,) and h.shape == (m,) and b.shape == (p,)

    x = np.zeros(n)
    y = np.zeros(max(p, 1))
    z = np.zeros(max(m, 1))
    iters = ctypes.c_int(0)
    dp = ctypes.POINTER(ctypes.c_double)

    def ptr(a):
        return a.ctypes.data_as(dp)

    code = lib.iswift_solve_dense(
        n, m, p, ptr(P), ptr(c),
        ptr(A) if p > 0 else None, ptr(b) if p > 0 else None,
        ptr(G), ptr(h), float(sigma_d),
        ptr(x), ptr(y), ptr(z), ctypes.byref(iters))
    return x, y[:p], z[:m], int(code), int(iters.value)
