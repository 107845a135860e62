#!/bin/bash
# Development CLI wrapper — dev-mode ops (status / check / kill-existing /
# force-restart / serve / bench) through erlvectordb_tpu.cli with
# EVDB_DEV_MODE set, so ports land in the 908x/909x dev ranges.
# Reference analogue: dev-cli.sh (compile + run dev_cli.erl with
# ERLVECTORDB_DEV_MODE=true); no compile step here — pure Python.

set -e
SCRIPT_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
cd "$SCRIPT_DIR"

if [ -z "$EVDB_DEV_MODE" ] && [ -z "$ERLVECTORDB_DEV_MODE" ]; then
    export EVDB_DEV_MODE=true
fi

if [ $# -eq 0 ]; then
    exec python -m erlvectordb_tpu.cli status
else
    exec python -m erlvectordb_tpu.cli "$@"
fi
