#!/bin/sh
# Test runner (tool/ parity with the reference's helper scripts).
set -e
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -q "$@"
