#!/bin/sh
# Build/test/clean driver (reference build.sh equivalent).
set -e
cd "$(dirname "$0")/.."
case "${1:-build}" in
  build)
    docker build -t tpu3drec -f deploy/Dockerfile . ;;
  test)
    python -m pytest tests/ -q ;;
  bench)
    python bench.py ;;
  native)
    make -C native ;;
  clean)
    rm -rf build dist *.egg-info native/*.so
    find . -name __pycache__ -type d -prune -exec rm -rf {} + ;;
  *)
    echo "usage: $0 {build|test|bench|native|clean}" >&2; exit 2 ;;
esac
