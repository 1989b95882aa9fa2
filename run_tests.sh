#!/bin/bash
# Test runner. Tiers (VERDICT r3 #4):
#   ./run_tests.sh cpu        — FAST tier on the 8-device virtual CPU mesh
#                               (unit + parity; 9:15 single-core, r5)
#   ./run_tests.sh cpu-slow   — only the slow tier (closed loops, full-model
#                               CP/ring matrices, cross-framework trajectory
#                               arms incl. AED, parallel-equivalence matrix;
#                               ~45 min single-core)
#   ./run_tests.sh cpu-all    — everything (fast + slow)
#   ./run_tests.sh            — default backend (TPU via axon tunnel if
#                               available), fast tier
# Extra pytest args pass through after the mode word.
#
# NOTE: the axon sitecustomize initializes jax at interpreter startup, so the
# platform MUST be selected via environment before python starts — conftest
# cannot override it.
set -e
cd "$(dirname "$0")"

CPU_ENV=(env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= XLA_FLAGS="--xla_force_host_platform_device_count=8")
case "$1" in
  cpu)
    shift
    "${CPU_ENV[@]}" python -m pytest tests/ -q -m "not slow" "$@"
    ;;
  cpu-slow)
    shift
    "${CPU_ENV[@]}" python -m pytest tests/ -q -m "slow" "$@"
    ;;
  cpu-all)
    shift
    "${CPU_ENV[@]}" python -m pytest tests/ -q "$@"
    ;;
  *)
    # LCASR_TEST_TPU=1 tells conftest this TPU run is intentional (otherwise
    # it re-execs onto the CPU backend — see tests/conftest.py)
    LCASR_TEST_TPU=1 python -m pytest tests/ -q -m "not slow" "$@"
    ;;
esac
