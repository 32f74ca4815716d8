#!/usr/bin/env sh
# Formatting check (tool/check-format.sh parity with the reference).
# Native sources: clang-format dry run when the binary exists.
# Python: byte-compile sanity over the package and tests.
set -e
cd "$(dirname "$0")/.."

C_FILES=$(find avxwindowfmindex_tpu/native -type f \( -name '*.c' -o -name '*.cpp' -o -name '*.h' \))

if command -v clang-format >/dev/null 2>&1; then
  clang-format --dry-run --Werror ${C_FILES}
else
  echo "check-format: clang-format not installed; skipping native style check" >&2
fi

python -m compileall -q avxwindowfmindex_tpu tests bench.py __graft_entry__.py
echo "check-format: ok"
