#!/usr/bin/env python
"""Standalone MCP example client — a runnable end-to-end tour of the server.

The reference ships a self-contained ``examples/mcp_client.py``
(reproduced at /root/reference/README.md:740-1135) that walks OAuth token
acquisition, MCP initialize, tools/list, store CRUD, search, and backups
against a live server.  This is that script for the TPU stack, built on
the repo's client library (serve/client.py) so reconnect, token refresh,
and 401 retry come for free.

Usage (server side first):

    python -m erlvectordb_tpu.cli serve        # terminal 1
    python examples/mcp_client.py              # terminal 2

Options:

    python examples/mcp_client.py --host 127.0.0.1 --port 8080 \
        --oauth-url http://127.0.0.1:8081/oauth/token \
        --store demo_store --dim 64 --count 200 --searches 5
    python examples/mcp_client.py --no-auth    # server with oauth disabled
    python examples/mcp_client.py --keep       # leave the demo store behind

Exit code 0 = every step succeeded; each step prints what it proved.
"""

from __future__ import annotations

import argparse
import random
import sys
import time

sys.path.insert(0, ".")  # repo-root execution

from erlvectordb_tpu.serve.client import (  # noqa: E402
    ClientError,
    VectorDBClient,
)


def log(msg: str) -> None:
    print(msg, flush=True)


def step(title: str):
    log(f"\n=== {title} ===")


def make_vectors(count: int, dim: int, seed: int = 7):
    """Deterministic demo corpus: ``count`` clustered vectors in ``dim``-d
    (four loose clusters so nearest-neighbor results are interpretable)."""
    rnd = random.Random(seed)
    centers = [[rnd.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(4)]
    out = []
    for i in range(count):
        c = centers[i % 4]
        out.append((f"vec_{i:04d}",
                    [x + rnd.gauss(0.0, 0.25) for x in c],
                    {"cluster": i % 4, "batch": i // 50}))
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n", 1)[0])
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8080, help="MCP TCP port")
    ap.add_argument("--oauth-url",
                    default="http://127.0.0.1:8081/oauth/token")
    ap.add_argument("--client-id", default="erlvectordb_client")
    ap.add_argument("--client-secret", default="erlvectordb_secret")
    ap.add_argument("--no-auth", action="store_true",
                    help="server runs with oauth disabled")
    ap.add_argument("--store", default="mcp_example")
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--count", type=int, default=200,
                    help="vectors to insert")
    ap.add_argument("--searches", type=int, default=5)
    ap.add_argument("--keep", action="store_true",
                    help="do not delete the demo store at the end")
    args = ap.parse_args()

    client = VectorDBClient(
        host=args.host, mcp_port=args.port,
        oauth_url=None if args.no_auth else args.oauth_url,
        client_id=args.client_id, client_secret=args.client_secret,
        auth_enabled=not args.no_auth,
    )

    # ---- 1. MCP handshake ------------------------------------------------
    step("initialize (MCP handshake)")
    try:
        info = client.initialize()
    except ClientError as e:
        log(f"cannot reach the server at {args.host}:{args.port}: {e}")
        log("start one with:  python -m erlvectordb_tpu.cli serve")
        return 1
    log(f"server: {info['serverInfo']['name']} "
        f"{info['serverInfo']['version']}  "
        f"protocol {info['protocolVersion']}")

    # ---- 2. tool discovery (scope-filtered) --------------------------------
    step("tools/list")
    tools = client.list_tools()
    log(f"{len(tools)} tools visible to this token: "
        + ", ".join(sorted(t["name"] for t in tools)[:8]) + ", ...")

    # ---- 3. store lifecycle ------------------------------------------------
    step(f"create_store {args.store!r} (dim={args.dim}, cosine)")
    try:
        created = client.create_store(args.store, dimension=args.dim,
                                      metric="cosine")
        log(f"created: {created}")
    except ClientError as e:
        if "exists" not in str(e).lower():
            raise
        log("store already exists — reusing it")

    # ---- 4. inserts --------------------------------------------------------
    step(f"insert {args.count} vectors")
    corpus = make_vectors(args.count, args.dim)
    t0 = time.perf_counter()
    for vid, vec, meta in corpus:
        client.insert_vector(args.store, vid, vec, metadata=meta)
    dt = time.perf_counter() - t0
    log(f"{args.count} inserts in {dt:.2f}s "
        f"({args.count / max(dt, 1e-9):.0f} req/s through MCP TCP)")

    # ---- 5. searches -------------------------------------------------------
    step(f"search_vectors x{args.searches} (k=5)")
    ok = 0
    for i in range(args.searches):
        probe_id, probe_vec, probe_meta = corpus[i * 13 % len(corpus)]
        results = client.search_vectors(args.store, probe_vec, k=5)
        top = results[0]
        log(f"  query={probe_id}  top1={top['id']} "
            f"dist={top['distance']:.4f}  "
            f"({len(results)} hits)")
        # the probe vector itself is in the store: it must come back first
        ok += top["id"] == probe_id
    log(f"self-hit check: {ok}/{args.searches} probes returned themselves")
    if ok != args.searches:
        log("FAIL: a stored vector did not rank first for its own query")
        return 1

    # ---- 6. metadata + stats ----------------------------------------------
    step("get_store_stats")
    stats = client.get_store_stats(args.store)
    log(f"count={stats['count']}  dimension={stats['dimension']}  "
        f"metric={stats['metric']}")

    # ---- 7. delete + verify ------------------------------------------------
    step("delete_vector + verify")
    victim = corpus[0][0]
    client.delete_vector(args.store, victim)
    results = client.search_vectors(args.store, corpus[0][1], k=5)
    if any(r["id"] == victim for r in results):
        log(f"FAIL: deleted vector {victim} still returned")
        return 1
    log(f"{victim} deleted and no longer searchable")

    # ---- 8. persistence ----------------------------------------------------
    step("sync_store + backup_store + list_backups")
    client.sync_store(args.store)
    backup_name = f"{args.store}_example_{int(time.time())}"
    client.backup_store(args.store, backup_name)
    backups = client.list_backups()
    assert any(backup_name in str(b) for b in backups), backups
    log(f"backup {backup_name!r} recorded ({len(backups)} total)")

    # ---- 9. cleanup ----------------------------------------------------------
    if not args.keep:
        step("cleanup")
        try:
            client.tool("delete_store", store=args.store)
            log(f"store {args.store!r} deleted")
        except ClientError as e:
            log(f"cleanup skipped: {e}")

    log("\nall steps passed.")
    client.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
