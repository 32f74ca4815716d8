#!/usr/bin/env sh
# Apply formatting (tool/run-format.sh parity with the reference).
# Rewrites native sources with clang-format when available.
set -e
cd "$(dirname "$0")/.."

C_FILES=$(find avxwindowfmindex_tpu/native -type f \( -name '*.c' -o -name '*.cpp' -o -name '*.h' \))

if command -v clang-format >/dev/null 2>&1; then
  clang-format -i ${C_FILES}
else
  echo "run-format: clang-format not installed; nothing to do" >&2
fi
