#!/bin/bash
# Test runner. Two modes:
#   ./run_tests.sh          — default backend (TPU via axon tunnel if available)
#   ./run_tests.sh cpu      — 8-device virtual CPU mesh (multi-chip sharding tests)
#
# NOTE: the axon sitecustomize initializes jax at interpreter startup, so the
# platform MUST be selected via environment before python starts — conftest
# cannot override it.
set -e
cd "$(dirname "$0")"
if [ "$1" = "cpu" ]; then
  shift
  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
  XLA_FLAGS="--xla_force_host_platform_device_count=8" \
  python -m pytest tests/ -q "$@"
else
  # LCASR_TEST_TPU=1 tells conftest this TPU run is intentional (otherwise
  # it re-execs onto the CPU backend — see tests/conftest.py)
  LCASR_TEST_TPU=1 python -m pytest tests/ -q "$@"
fi
