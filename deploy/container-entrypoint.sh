#!/bin/sh
# Container entrypoint (parity with the reference's
# examples/container-entrypoint.sh): propagate signals, support PORT
# override, then exec the server so SIGTERM reaches the python process.
set -e

echo "erlvectordb-tpu container starting (PORT=${PORT:-default})"

case "$1" in
  serve)
    exec python -m erlvectordb_tpu.cli serve
    ;;
  bridge)
    exec python -m erlvectordb_tpu.cli bridge
    ;;
  bench)
    shift
    exec python bench.py "$@"
    ;;
  *)
    exec "$@"
    ;;
esac
