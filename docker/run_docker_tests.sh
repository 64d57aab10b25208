#!/usr/bin/env bash
# Build the CPU image and run a test tier inside it (default: --fast).
set -euo pipefail
cd "$(dirname "$0")/.."
docker build -f docker/Dockerfile -t srl-tpu-test .
docker run --rm srl-tpu-test ./run_tests.sh "${@:---fast}"
