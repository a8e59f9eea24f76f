#!/usr/bin/env bash
# CI harness (the reference's sub-gtest.sh equivalent): run the suite on the
# virtual 8-device CPU mesh, fail on first error, tail the log.
set -euo pipefail
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -x -q -m "not slow" "$@"
