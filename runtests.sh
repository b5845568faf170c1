#!/bin/bash
# Fast CPU test run: bypass the axon TPU sitecustomize (~70 s of tunnel
# handshake per interpreter start) — unit tests are CPU-only by design.
cd "$(dirname "$0")"
if [ "$1" = "--slow" ]; then shift; PYTHONPATH=/root/repo JAX_PLATFORMS=cpu exec python -m pytest tests/ -q -n 2 -m slow --override-ini addopts= "$@"; fi
PYTHONPATH=/root/repo JAX_PLATFORMS=cpu exec python -m pytest tests/ -q "$@"
