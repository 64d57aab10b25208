#!/usr/bin/env bash
# Test entry point with the reference's tiers (run_tests.sh:2, conftest.py):
#   ./run_tests.sh --fast   only @fast smoke tests (parallel, one worker/core)
#   ./run_tests.sh          everything but @slow
#   ./run_tests.sh --all    the full suite
set -euo pipefail
cd "$(dirname "$0")"
# The smoke tier is compile-bound; spread it over the available cores with
# pytest-xdist. The fuller tiers stay serial: they include process-spawning
# and port-binding tests that own machine-wide resources.
if [[ "${1:-}" == "--fast" ]]; then
  python -m pytest tests/ -q -n "$(nproc)" "$@"
else
  python -m pytest tests/ -q "$@"
fi
