"""Reference-format parameter-file loaders.

Reads the reference's positional whitespace-separated param files
(`src/Parameters.cpp:9-166` routes files by filename substring "LL" /
"MPC" / "Walking") into srbx typed configs, so existing parameter sets
carry over unchanged.
"""

from __future__ import annotations

import dataclasses
import re
from pathlib import Path

from srbx.config import EngineConfig, LowLevelConfig, MotionConfig


def _read_numbers(path):
    """Leading numeric tokens of the file (comment tail ignored, like the
    reference's fscanf sequence that simply stops at non-numeric text)."""
    out = []
    for tok in Path(path).read_text().split():
        if re.fullmatch(r"[-+]?\d*\.?\d+(e[-+]?\d+)?", tok, re.I):
            out.append(float(tok))
        else:
            break
    return out


def load_lowlevel(path) -> LowLevelConfig:
    """Ordering per `src/Parameters.cpp:95-116` (LL_w_CLF.txt)."""
    v = _read_numbers(path)
    mu, kp, kd, use_clf, tau_pen, df_pen, aux_pen, clf_pen, aux_max, clf_eps = v[:10]
    return LowLevelConfig(
        mu=mu, kp=kp, kd=kd, use_clf=bool(int(use_clf)),
        tau_pen=tau_pen, df_pen=df_pen, aux_pen=aux_pen, clf_pen=clf_pen,
        aux_max=aux_max, clf_eps=clf_eps,
    )


def load_motion(path) -> MotionConfig:
    """Ordering per `src/Parameters.cpp:149-166` (Walking_params.txt)."""
    v = _read_numbers(path)
    stand, swing, fwd, lat, yaw = v[:5]
    return MotionConfig(
        stand_height=stand, swing_height=swing,
        fwd_speed=fwd, lat_speed=lat, yaw_speed=yaw,
    )


def load(argv) -> EngineConfig:
    """Route files by name keyword like `Parameters(argc, argv)`
    (`src/Parameters.cpp:13-25`)."""
    cfg = EngineConfig()
    for arg in argv:
        name = str(arg)
        if "LL" in name:
            cfg = dataclasses.replace(cfg, lowlevel=load_lowlevel(name))
        elif "Walking" in name:
            cfg = dataclasses.replace(cfg, motion=load_motion(name))
    return cfg
