#!/bin/sh
# Probe a running instance (parity with check-status.sh).
EVDB_DEV_MODE=${EVDB_DEV_MODE:-1} exec python -m erlvectordb_tpu.cli check
