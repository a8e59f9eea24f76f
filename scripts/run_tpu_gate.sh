#!/bin/bash
# Hardware-parity gate (VERDICT r3 #3): runs the TPU parity suite and writes
# TPU_PARITY_r<N>.txt with header AND full pytest tail in ONE atomic move —
# the file cannot exist in a header-only (tail-less) state.  A parity file
# without a pytest "N passed" summary line is INVALID by definition
# (CLAUDE.md pre-snapshot requirement).
#
# Usage: scripts/run_tpu_gate.sh <round-number>
set -u
N="${1:?usage: run_tpu_gate.sh <round-number>}"
cd "$(dirname "$0")/.."
out="TPU_PARITY_r${N}.txt"
tmp="$(mktemp)"
{
  echo "# TPU hardware parity gate — round ${N}"
  echo "# cmd: SSRLCV_TEST_PLATFORM=axon,cpu python -m pytest tests/test_tpu_parity.py -m tpu -q"
  echo "# date: $(date -u +%Y-%m-%dT%H:%M:%SZ)"
  echo "# commit: $(git rev-parse HEAD 2>/dev/null || echo unknown)"
  SSRLCV_TEST_PLATFORM=axon,cpu python -m pytest tests/test_tpu_parity.py -m tpu -q 2>&1 | tail -30
} > "$tmp"
mv "$tmp" "$out"
cat "$out"
if ! grep -qE "[0-9]+ passed" "$out"; then
  echo "GATE INVALID: no pytest pass summary captured in ${out}" >&2
  exit 1
fi
if grep -qE "[0-9]+ (failed|error)" "$out"; then
  echo "GATE FAILED: see ${out}" >&2
  exit 1
fi
