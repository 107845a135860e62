#!/usr/bin/env bash
# Black-box smoke test against a RUNNING server (the reference's
# test_server.sh analogue): OAuth token -> MCP initialize -> tools/list ->
# create/insert/search roundtrip -> REST health -> client info.
# Usage: ./test_server.sh [host] [mcp_port] [oauth_port] [rest_port]
# Client/bridge wiring (env-var matrix, Gemini CLI / Claude Desktop configs):
# docs/BRIDGE_SETUP.md; scripted end-to-end demo: examples/setup_demo.sh
set -u
HOST=${1:-127.0.0.1}
MCP=${2:-${EVDB_MCP_PORT:-8080}}
OAUTH=${3:-${EVDB_OAUTH_PORT:-8081}}
REST=${4:-${EVDB_REST_PORT:-8082}}
CID=${EVDB_CLIENT_ID:-erlvectordb_client}
CSECRET=${EVDB_CLIENT_SECRET:-erlvectordb_secret}
PASS=0; FAIL=0
ok()   { PASS=$((PASS+1)); echo "  [ok] $1"; }
bad()  { FAIL=$((FAIL+1)); echo "  [FAIL] $1"; }

echo "== 1. OAuth token (POST /oauth/token) =="
TOKEN_JSON=$(curl -sf -X POST "http://$HOST:$OAUTH/oauth/token" \
  -H 'Content-Type: application/x-www-form-urlencoded' \
  -d "grant_type=client_credentials&client_id=$CID&client_secret=$CSECRET")
TOKEN=$(printf '%s' "$TOKEN_JSON" | sed -n 's/.*"access_token": *"\([^"]*\)".*/\1/p')
[ -n "$TOKEN" ] && ok "got access token" || bad "no access token: $TOKEN_JSON"

echo "== 2. OAuth client info (GET /oauth/client_info) =="
curl -sf "http://$HOST:$OAUTH/oauth/client_info" \
  -H "Authorization: Bearer $TOKEN" | grep -q scopes \
  && ok "client info has scopes" || bad "client info"

# MCP is newline-delimited JSON-RPC over raw TCP: drive it with bash /dev/tcp
mcp() { # $1 = json request; prints one response line
  exec 9<>"/dev/tcp/$HOST/$MCP" || return 1
  printf '%s\n' "$1" >&9
  IFS= read -r line <&9
  exec 9<&- 9>&-
  printf '%s' "$line"
}

echo "== 3. MCP initialize =="
R=$(mcp '{"jsonrpc":"2.0","id":1,"method":"initialize","params":{}}')
printf '%s' "$R" | grep -q protocolVersion && ok "initialize" || bad "initialize: $R"

echo "== 4. MCP tools/list (authed) =="
R=$(mcp "{\"jsonrpc\":\"2.0\",\"id\":2,\"method\":\"tools/list\",\"params\":{},\"auth\":{\"token\":\"$TOKEN\"}}")
printf '%s' "$R" | grep -q search_vectors && ok "tools include search_vectors" || bad "tools/list: $R"

echo "== 5. MCP create/insert/search roundtrip =="
STORE="smoke_$$"
R=$(mcp "{\"jsonrpc\":\"2.0\",\"id\":3,\"method\":\"tools/call\",\"params\":{\"name\":\"create_store\",\"arguments\":{\"name\":\"$STORE\"}},\"auth\":{\"token\":\"$TOKEN\"}}")
printf '%s' "$R" | grep -q '\\"count\\": 0' && ok "create_store (empty, not the reference's insert-bug)" || bad "create_store: $R"
R=$(mcp "{\"jsonrpc\":\"2.0\",\"id\":4,\"method\":\"tools/call\",\"params\":{\"name\":\"insert_vector\",\"arguments\":{\"store\":\"$STORE\",\"id\":\"a\",\"vector\":[1.0,0.5]}},\"auth\":{\"token\":\"$TOKEN\"}}")
printf '%s' "$R" | grep -q '\\"status\\": \\"ok\\"' && ok "insert_vector" || bad "insert: $R"
R=$(mcp "{\"jsonrpc\":\"2.0\",\"id\":5,\"method\":\"tools/call\",\"params\":{\"name\":\"search_vectors\",\"arguments\":{\"store\":\"$STORE\",\"vector\":[1.0,0.5],\"k\":1}},\"auth\":{\"token\":\"$TOKEN\"}}")
printf '%s' "$R" | grep -q '\\"id\\": \\"a\\"' && ok "search top-1 == a" || bad "search: $R"
mcp "{\"jsonrpc\":\"2.0\",\"id\":6,\"method\":\"tools/call\",\"params\":{\"name\":\"delete_store\",\"arguments\":{\"store\":\"$STORE\"}},\"auth\":{\"token\":\"$TOKEN\"}}" >/dev/null

echo "== 6. MCP auth rejection (no token) =="
R=$(mcp '{"jsonrpc":"2.0","id":7,"method":"tools/list","params":{}}')
printf '%s' "$R" | grep -q '\-32001' && ok "unauthenticated rejected" || bad "auth gap: $R"

echo "== 7. REST health (GET /health, /ready) =="
curl -sf "http://$HOST:$REST/health" | grep -q healthy && ok "/health" || bad "/health"
curl -sf "http://$HOST:$REST/ready" >/dev/null && ok "/ready" || bad "/ready"

echo "== 8. REST authed store list =="
curl -sf "http://$HOST:$REST/api/v1/stores" -H "Authorization: Bearer $TOKEN" \
  | grep -q stores && ok "GET /api/v1/stores" || bad "stores list"

echo
echo "passed: $PASS, failed: $FAIL"
[ "$FAIL" -eq 0 ]
