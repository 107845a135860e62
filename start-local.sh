#!/bin/sh
# Start a local dev instance (parity with the reference's start-local.sh:
# setup + start with dev ports). Writes the PID to .evdb.pid.
set -e
export EVDB_DEV_MODE=1
echo "starting erlvectordb-tpu in development mode (ports 908x)..."
nohup python -m erlvectordb_tpu.cli serve > .evdb.log 2>&1 &
echo $! > .evdb.pid
sleep 2
python -m erlvectordb_tpu.cli check || true
echo "started (pid $(cat .evdb.pid)); logs in .evdb.log"
