"""ctypes bindings to the native host runtime (native/srbx_rt.cpp).

The runtime provides what the reference gets from the Unitree SDK and boost:
CPU-pinned fixed-rate loops (`LoopFunc`), a lock-free shared-state store
(`sharedData` + mutex), and UDP endpoints (`multi_pc_comm.h`). The library
is built on demand with the repo's Makefile (g++ only — no pybind11).
"""

from __future__ import annotations

import ctypes
import dataclasses
import pathlib
import struct
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
        self._n_slots = n_slots
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

    def backup(self) -> list:
        """Snapshot every slot — the reference's `backupData` copy of the
        shared store between batch-sim runs (`include/shared_structs.hpp:
        320-343`, restored at `src/A1_Sim_Series.cpp:527-537`)."""
        return [self.read(i) for i in range(self._n_slots)]

    def restore(self, snapshot: list):
        """Write a `backup()` snapshot back into the store."""
        for i, data in enumerate(snapshot):
            self.write(i, data)

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


# --------------------------------------------------------------------------- #
# Wireless remote parsing (`include/remoteCtrl.h:4-81`, frame layout per the
# vendored `unitree_legged_sdk/include/unitree_legged_sdk/unitree_joystick.h`:
# head[2] | 16-bit button union | lx, rx, ry, L2, ly floats — 40-byte frame).
# --------------------------------------------------------------------------- #

_BTN_BYTE2 = ("R1", "L1", "start", "select", "R2", "L2")
_BTN_BYTE3 = ("A", "B", "X", "Y", "up", "right", "down", "left")
REMOTE_BUTTONS = _BTN_BYTE2 + ("F1", "F2") + _BTN_BYTE3


@dataclasses.dataclass
class RemoteState:
    """Decoded wireless-remote frame. Button values use the reference's
    press-state convention (`remoteCtrl.h:38`): 0 = released, 1 = newly
    pressed this frame, 2 = held."""

    buttons: dict
    lx: float = 0.0
    rx: float = 0.0
    ry: float = 0.0
    l2: float = 0.0
    ly: float = 0.0


def parse_remote(raw: bytes, prev: RemoteState | None = None) -> RemoteState:
    """Decode a 40-byte Unitree wireless-remote frame
    (`getButtonState`, `include/remoteCtrl.h:31-81`)."""
    if len(raw) < 24:
        raise ValueError(f"remote frame too short: {len(raw)} bytes")
    old = prev.buttons if prev is not None else {}
    btns = {}
    for c, name in enumerate(_BTN_BYTE2):
        pressed = (raw[2] >> c) & 1
        btns[name] = (2 if old.get(name, 0) >= 1 else 1) if pressed else 0
    btns["F1"] = (raw[2] >> 6) & 1
    btns["F2"] = (raw[2] >> 7) & 1
    for c, name in enumerate(_BTN_BYTE3):
        pressed = (raw[3] >> c) & 1
        btns[name] = (2 if old.get(name, 0) >= 1 else 1) if pressed else 0
    lx, rx, ry, l2, ly = struct.unpack_from("<5f", raw, 4)
    return RemoteState(buttons=btns, lx=lx, rx=rx, ry=ry, l2=l2, ly=ly)


# --------------------------------------------------------------------------- #
# Joint-restore utility (`src/restoreConfig.cpp:34-76`): ramp the legs back
# to the tucked nominal configuration with a linear interpolation at 500 Hz.
# --------------------------------------------------------------------------- #

RESTORE_TARGET = (0.0, 1.310163, -2.525674)  # (hip, thigh, calf) per leg
RESTORE_KP = 180.0
RESTORE_KD = 12.0


def restore_joint_command(q_init, t_s: float, start_s: float = 1.0,
                          duration_s: float = 2.0):
    """Joint position command at time t_s of the restore ramp.

    q_init: (12,) joint angles captured during the settle window.
    Returns (q_cmd (12,), kp, kd): before start_s the command is q_init with
    zero gains (the reference sends zero-gain commands while settling,
    `restoreConfig.cpp:73-79`); during the ramp, linear interpolation to the
    tucked pose with stiff PD (`:59-71`).
    """
    import numpy as _np

    q_init = _np.asarray(q_init, float)
    target = _np.tile(_np.asarray(RESTORE_TARGET), 4)
    rate = (t_s - start_s) / duration_s
    rate = min(max(rate, 0.0), 1.0)
    if t_s < start_s:
        return q_init.copy(), 0.0, 0.0
    return q_init * (1.0 - rate) + target * rate, RESTORE_KP, RESTORE_KD
