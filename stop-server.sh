#!/bin/sh
# Stop the local dev instance gracefully (parity with stop-server.sh):
# SIGTERM triggers the priority-ordered shutdown callbacks.
if [ -f .evdb.pid ]; then
  PID=$(cat .evdb.pid)
  if kill -0 "$PID" 2>/dev/null; then
    echo "stopping erlvectordb-tpu (pid $PID)..."
    kill -TERM "$PID"
    for _ in $(seq 1 30); do
      kill -0 "$PID" 2>/dev/null || break
      sleep 1
    done
    kill -0 "$PID" 2>/dev/null && kill -KILL "$PID"
  fi
  rm -f .evdb.pid
  echo "stopped"
else
  echo "no .evdb.pid found"
fi
