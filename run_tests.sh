#!/usr/bin/env bash
# Test entry point with the reference's tiers (run_tests.sh:2, conftest.py):
#   ./run_tests.sh --fast   only @fast smoke tests
#   ./run_tests.sh          everything but @slow
#   ./run_tests.sh --all    the full suite
set -euo pipefail
cd "$(dirname "$0")"
python -m pytest tests/ -q "$@"
