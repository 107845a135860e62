#!/usr/bin/env bash
# End-to-end demo setup: start a server, verify the serving surfaces, run the
# stdio bridge + AI demo client against it, then clean up.
#
# Capability parity with the reference's examples/setup_gemini_demo.sh
# (environment checks -> server boot -> client wiring -> demo run), minus the
# pip installs: everything here is stdlib + the in-repo package.  The demo
# embedder is the dependency-free HashingEmbedder; to use a real LLM embedder
# wire a CallableEmbedder (see examples/ai_demo_client.py docstring).
#
# Usage:  examples/setup_demo.sh [workdir]
#   workdir (default: a fresh mktemp dir) holds persistence + logs so the
#   demo never touches ./data.

set -euo pipefail
cd "$(dirname "$0")/.."

WORK="${1:-$(mktemp -d /tmp/evdb_demo.XXXXXX)}"
mkdir -p "$WORK"
echo "==> workdir: $WORK"

command -v python >/dev/null || { echo "ERROR: python not found"; exit 1; }
python - <<'EOF' || { echo "ERROR: erlvectordb_tpu not importable"; exit 1; }
import erlvectordb_tpu  # noqa: F401
EOF
echo "==> package import OK"

# --- config: isolated persistence dirs so re-runs never collide -----------
CFG="$WORK/demo.json"
python - "$WORK" > "$CFG" <<'EOF'
import json, sys
w = sys.argv[1]
cfg = json.load(open("config/evdb.example.json"))
cfg["persistence_dir"] = w + "/data"
cfg["backup_dir"] = w + "/backups"
print(json.dumps(cfg))
EOF

# --- start the server -------------------------------------------------------
EVDB_CONFIG_FILE="$CFG" python -m erlvectordb_tpu.cli serve > "$WORK/server.out" 2> "$WORK/server.log" &
SERVER_PID=$!
echo "$SERVER_PID" > "$WORK/server.pid"
cleanup() { kill -9 "$SERVER_PID" 2>/dev/null || true; }
trap cleanup EXIT

# the ONE stdout JSON line carries the REAL ports (preferred ports fall back
# silently when occupied — never assume 8080/8081)
for _ in $(seq 1 60); do
  [ -s "$WORK/server.out" ] && break
  kill -0 "$SERVER_PID" 2>/dev/null || { echo "ERROR: server died:"; cat "$WORK/server.log"; exit 1; }
  sleep 0.5
done
[ -s "$WORK/server.out" ] || { echo "ERROR: no server status line"; exit 1; }

MCP_PORT=$(python -c "import json,sys; print(json.load(open('$WORK/server.out'))['ports']['mcp_server'])")
OAUTH_PORT=$(python -c "import json,sys; print(json.load(open('$WORK/server.out'))['ports']['oauth_server'])")
echo "==> server up (pid $SERVER_PID): mcp=$MCP_PORT oauth=$OAUTH_PORT"

export EVDB_HOST=127.0.0.1
export EVDB_MCP_PORT="$MCP_PORT"
export EVDB_OAUTH_URL="http://127.0.0.1:$OAUTH_PORT/oauth/token"
export EVDB_CLIENT_ID=erlvectordb_client
export EVDB_CLIENT_SECRET=erlvectordb_secret

# --- drive the stdio bridge exactly as an AI client would -------------------
echo "==> bridge smoke (initialize + tools/list over stdio)"
python - <<'EOF'
import json, subprocess, sys
proc = subprocess.Popen(
    [sys.executable, "-m", "erlvectordb_tpu.serve.stdio_bridge"],
    stdin=subprocess.PIPE, stdout=subprocess.PIPE, text=True)
def rpc(req):
    proc.stdin.write(json.dumps(req) + "\n"); proc.stdin.flush()
    return json.loads(proc.stdout.readline())
init = rpc({"jsonrpc": "2.0", "id": 1, "method": "initialize", "params": {}})
assert init["result"]["protocolVersion"] == "2024-11-05", init
tools = rpc({"jsonrpc": "2.0", "id": 2, "method": "tools/list", "params": {}})
names = [t["name"] for t in tools["result"]["tools"]]
assert "search_vectors" in names, names
print(f"    bridge OK: {len(names)} tools advertised")
proc.stdin.close(); proc.wait(timeout=10)
EOF

# --- run the AI demo client (smart insert / smart search) -------------------
echo "==> AI demo client"
python examples/ai_demo_client.py

echo "==> demo complete; server log at $WORK/server.log"
