#!/usr/bin/env bash
# Full CPU-backend test suite (8 virtual devices; see tests/conftest.py).
set -e
cd "$(dirname "$0")/.."
exec python -m pytest tests/ -q "$@"
