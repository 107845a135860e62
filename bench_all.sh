#!/bin/sh
# Run every benchmark config and collect the JSON lines into BENCH_ALL.json.
# Usage: ./bench_all.sh [--quick]
set -e
QUICK=${1:-}
OUT=BENCH_ALL.json
: > "$OUT"
for cfg in 1 2 3 4 5 6 7 8 9 10 11; do
  echo "=== config $cfg ===" >&2
  python bench.py --config "$cfg" $QUICK 2>"/tmp/bench_cfg$cfg.log" | tail -1 >> "$OUT"
done
echo "wrote $OUT" >&2
cat "$OUT"
