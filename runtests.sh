#!/usr/bin/env bash
# Test orchestration (reference runtests.sh analogue).
#   ./runtests.sh            # full suite on the virtual CPU mesh
#   ./runtests.sh --quick    # skip slow (multi-process) tests
#   ./runtests.sh --dist     # only the multi-process distributed tests
set -euo pipefail
cd "$(dirname "$0")"
case "${1:-}" in
  --quick) exec python -m pytest tests/ -q -m "not slow" ;;
  --dist)  exec python -m pytest tests/test_distributed.py tests/test_parallel.py -q ;;
  *)       exec python -m pytest tests/ -q ;;
esac
