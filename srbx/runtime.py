"""ctypes bindings to the native host runtime (native/srbx_rt.cpp).

The runtime provides what the reference gets from the Unitree SDK and boost:
CPU-pinned fixed-rate loops (`LoopFunc`), a lock-free shared-state store
(`sharedData` + mutex), and UDP endpoints (`multi_pc_comm.h`). The library
is built on demand with the repo's Makefile (g++ only — no pybind11).
"""

from __future__ import annotations

import ctypes
import pathlib
import subprocess

_DIR = pathlib.Path(__file__).resolve().parent.parent / "native"
_LIB_PATH = _DIR / "libsrbx_rt.so"

LOOP_CB = ctypes.CFUNCTYPE(None, ctypes.c_void_p, ctypes.c_int64)


def _build():
    subprocess.run(["make", "-s", "-C", str(_DIR)], check=True)


def load():
    if not _LIB_PATH.exists():
        _build()
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.srbx_loop_create.restype = ctypes.c_void_p
    lib.srbx_loop_create.argtypes = [ctypes.c_int64, ctypes.c_int, LOOP_CB, ctypes.c_void_p]
    lib.srbx_loop_start.argtypes = [ctypes.c_void_p]
    lib.srbx_loop_stop.argtypes = [ctypes.c_void_p]
    lib.srbx_loop_ticks.restype = ctypes.c_int64
    lib.srbx_loop_ticks.argtypes = [ctypes.c_void_p]
    lib.srbx_loop_overruns.restype = ctypes.c_int64
    lib.srbx_loop_overruns.argtypes = [ctypes.c_void_p]
    lib.srbx_loop_latency_pct.restype = ctypes.c_int64
    lib.srbx_loop_latency_pct.argtypes = [ctypes.c_void_p, ctypes.c_double]
    lib.srbx_loop_destroy.argtypes = [ctypes.c_void_p]

    lib.srbx_store_create.restype = ctypes.c_void_p
    lib.srbx_store_create.argtypes = [ctypes.c_int, ctypes.c_int]
    lib.srbx_store_write.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                     ctypes.c_char_p, ctypes.c_int]
    lib.srbx_store_read.restype = ctypes.c_int
    lib.srbx_store_read.argtypes = [ctypes.c_void_p, ctypes.c_int,
                                    ctypes.c_char_p, ctypes.c_int]
    lib.srbx_store_version.restype = ctypes.c_uint64
    lib.srbx_store_version.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.srbx_store_destroy.argtypes = [ctypes.c_void_p]

    lib.srbx_udp_open.restype = ctypes.c_int
    lib.srbx_udp_open.argtypes = [ctypes.c_int]
    lib.srbx_udp_send.restype = ctypes.c_int
    lib.srbx_udp_send.argtypes = [ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
                                  ctypes.c_char_p, ctypes.c_int]
    lib.srbx_udp_recv.restype = ctypes.c_int
    lib.srbx_udp_recv.argtypes = [ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
                                  ctypes.c_int]
    lib.srbx_udp_close.argtypes = [ctypes.c_int]
    return lib


class RateLoop:
    """CPU-pinned fixed-rate loop driving a Python callback.

    The production pattern (the reference's `mpc_loop` @20 ms / `calc_loop`
    @1 ms, `driver_scripts/qp_only_exp.cpp:665-668`): the callback dispatches
    a pre-compiled jitted step and writes results into a SharedStore.
    """

    def __init__(self, lib, period_us: int, callback, cpu: int = -1):
        self._lib = lib
        self._cb = LOOP_CB(lambda user, tick: callback(tick))
        self._h = lib.srbx_loop_create(period_us, cpu, self._cb, None)

    def start(self):
        self._lib.srbx_loop_start(self._h)

    def stop(self):
        self._lib.srbx_loop_stop(self._h)

    @property
    def ticks(self):
        return self._lib.srbx_loop_ticks(self._h)

    @property
    def overruns(self):
        return self._lib.srbx_loop_overruns(self._h)

    def latency_ns(self, pct=50.0):
        return self._lib.srbx_loop_latency_pct(self._h, pct)

    def close(self):
        self._lib.srbx_loop_destroy(self._h)
        self._h = None


class SharedStore:
    """Lock-free seqlock slots (single writer / many readers per slot)."""

    def __init__(self, lib, n_slots: int, slot_bytes: int):
        self._lib = lib
        self._slot_bytes = slot_bytes
        self._h = lib.srbx_store_create(n_slots, slot_bytes)

    def write(self, slot: int, data: bytes):
        self._lib.srbx_store_write(self._h, slot, data, len(data))

    def read(self, slot: int) -> bytes:
        buf = ctypes.create_string_buffer(self._slot_bytes)
        rc = self._lib.srbx_store_read(self._h, slot, buf, self._slot_bytes)
        if rc != 0:
            raise RuntimeError("store read did not stabilize")
        return buf.raw

    def version(self, slot: int) -> int:
        return self._lib.srbx_store_version(self._h, slot)

    def close(self):
        self._lib.srbx_store_destroy(self._h)
        self._h = None


class Udp:
    """UDP endpoint (the multi-PC neighbor-state bridge)."""

    def __init__(self, lib, bind_port: int = 0):
        self._lib = lib
        self._fd = lib.srbx_udp_open(bind_port)
        if self._fd < 0:
            raise OSError("udp open failed")

    def send(self, ip: str, port: int, data: bytes) -> int:
        return self._lib.srbx_udp_send(self._fd, ip.encode(), port, data, len(data))

    def recv(self, nbytes: int, timeout_ms: int = 100) -> bytes:
        buf = ctypes.create_string_buffer(nbytes)
        n = self._lib.srbx_udp_recv(self._fd, buf, nbytes, timeout_ms)
        return buf.raw[:n] if n > 0 else b""

    def close(self):
        self._lib.srbx_udp_close(self._fd)
        self._fd = -1
