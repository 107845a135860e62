#!/usr/bin/env node
/**
 * Node.js client for the erlvectordb-tpu MCP server.
 *
 * Capability parity with the Python client (erlvectordb_tpu/serve/client.py)
 * and the reference's JS example (it ships both Python and JS clients):
 * OAuth 2.1 client-credentials token fetch over HTTP, newline-delimited
 * JSON-RPC 2.0 over raw TCP, and wrappers for every tool.  Design points:
 *
 *   - promise-based: requests resolve by JSON-RPC id, so many calls can be
 *     IN FLIGHT on one socket (the server answers out of order — this is
 *     the high-throughput path, see searchMany below);
 *   - binary batch searches: Float32Array queries ride base64
 *     (vectors_b64) and results come back as binary columns when
 *     { encoding: "b64" } is set.
 *
 * Usage:
 *   const { VectorDBClient } = require("./mcp_client");
 *   const c = new VectorDBClient({ host: "127.0.0.1", mcpPort: 8080,
 *     oauthPort: 8081, clientId: "erlvectordb_client",
 *     clientSecret: "erlvectordb_secret" });
 *   await c.connect();
 *   await c.createStore("docs", { dimension: 4 });
 *   await c.insertVector("docs", "a", [1, 0, 0, 0], { lang: "en" });
 *   console.log(await c.searchVectors("docs", [1, 0, 0, 0], 3));
 *   c.close();
 *
 * Run `node mcp_client.js` for a self-contained demo against a local server.
 */

"use strict";

const net = require("net");
const http = require("http");
const { Buffer } = require("buffer");

class VectorDBClient {
  constructor(opts = {}) {
    this.host = opts.host || "127.0.0.1";
    this.mcpPort = opts.mcpPort || 8080;
    this.oauthPort = opts.oauthPort || 8081;
    this.clientId = opts.clientId || "erlvectordb_client";
    this.clientSecret = opts.clientSecret || "erlvectordb_secret";
    this.timeoutMs = opts.timeoutMs || 300000; // first query may compile
    this.token = null;
    this.sock = null;
    this.buf = "";
    this.nextId = 1;
    this.pending = new Map(); // id -> {resolve, reject, timer}
  }

  // ----------------------------------------------------------- OAuth token

  fetchToken() {
    const body = new URLSearchParams({
      grant_type: "client_credentials",
      client_id: this.clientId,
      client_secret: this.clientSecret,
    }).toString();
    return new Promise((resolve, reject) => {
      const req = http.request(
        {
          host: this.host,
          port: this.oauthPort,
          path: "/oauth/token",
          method: "POST",
          headers: { "Content-Type": "application/x-www-form-urlencoded" },
        },
        (res) => {
          let data = "";
          res.on("data", (c) => (data += c));
          res.on("end", () => {
            if (res.statusCode !== 200) {
              return reject(new Error(`token endpoint ${res.statusCode}: ${data}`));
            }
            const tok = JSON.parse(data);
            this.token = tok.access_token;
            resolve(tok);
          });
        }
      );
      req.on("error", reject);
      req.end(body);
    });
  }

  // ------------------------------------------------------------- transport

  connect({ auth = true } = {}) {
    const setup = auth && !this.token ? this.fetchToken() : Promise.resolve();
    return setup.then(
      () =>
        new Promise((resolve, reject) => {
          this.sock = net.createConnection(
            { host: this.host, port: this.mcpPort },
            () => resolve(this)
          );
          this.sock.on("error", (e) => {
            for (const p of this.pending.values()) p.reject(e);
            this.pending.clear();
            reject(e);
          });
          this.sock.on("data", (chunk) => this._onData(chunk));
          this.sock.on("close", () => {
            const e = new Error("connection closed");
            for (const p of this.pending.values()) p.reject(e);
            this.pending.clear();
          });
        })
    );
  }

  _onData(chunk) {
    this.buf += chunk.toString("utf8");
    let nl;
    while ((nl = this.buf.indexOf("\n")) >= 0) {
      const line = this.buf.slice(0, nl);
      this.buf = this.buf.slice(nl + 1);
      if (!line.trim()) continue;
      let msg;
      try {
        msg = JSON.parse(line);
      } catch {
        continue; // not ours to crash on
      }
      const p = this.pending.get(msg.id);
      if (!p) continue; // notification or unknown id
      this.pending.delete(msg.id);
      clearTimeout(p.timer);
      if (msg.error) p.reject(new Error(`${msg.error.code}: ${msg.error.message}`));
      else p.resolve(msg.result);
    }
  }

  /** One JSON-RPC request; resolves out-of-order by id (pipelinable). */
  call(method, params = {}) {
    const id = this.nextId++;
    const req = { jsonrpc: "2.0", id, method, params };
    if (this.token) req.auth = { token: this.token };
    return new Promise((resolve, reject) => {
      const timer = setTimeout(() => {
        this.pending.delete(id);
        reject(new Error(`request ${id} (${method}) timed out`));
      }, this.timeoutMs);
      this.pending.set(id, { resolve, reject, timer });
      this.sock.write(JSON.stringify(req) + "\n");
    });
  }

  /** tools/call wrapper returning the decoded tool result. */
  tool(name, args = {}) {
    return this.call("tools/call", { name, arguments: args }).then((res) => {
      const text = res && res.content && res.content[0] && res.content[0].text;
      return text ? JSON.parse(text) : res;
    });
  }

  close() {
    if (this.sock) this.sock.destroy();
    this.sock = null;
  }

  // ---------------------------------------------------------------- tools

  initialize() {
    return this.call("initialize", {});
  }
  listTools() {
    return this.call("tools/list", {}).then((r) => r.tools);
  }
  createStore(name, { dimension, metric, dtype } = {}) {
    const a = { name };
    if (dimension) a.dimension = dimension;
    if (metric) a.metric = metric;
    if (dtype) a.dtype = dtype;
    return this.tool("create_store", a);
  }
  insertVector(store, id, vector, metadata) {
    const a = { store, id, vector: Array.from(vector) };
    if (metadata) a.metadata = metadata;
    return this.tool("insert_vector", a);
  }
  searchVectors(store, vector, k = 10, opts = {}) {
    const a = { store, k, ...opts };
    if (vector instanceof Float32Array) {
      a.vector_b64 = Buffer.from(vector.buffer, vector.byteOffset,
        vector.byteLength).toString("base64");
    } else {
      a.vector = Array.from(vector);
    }
    return this.tool("search_vectors", a).then((r) => r.results);
  }
  /**
   * Batched search: queries is Float32Array (row-major) + dim, or an array
   * of arrays.  With binary=true, returns { rows: Int32Array, distances:
   * Float32Array, k } decoded from the server's base64 columns.
   */
  searchVectorsBatch(store, queries, dim, k = 10, { binary = false } = {}) {
    const a = { store, k };
    if (queries instanceof Float32Array) {
      a.vectors_b64 = Buffer.from(queries.buffer, queries.byteOffset,
        queries.byteLength).toString("base64");
      a.dim = dim;
    } else {
      a.vectors = queries.map((q) => Array.from(q));
    }
    if (binary) a.encoding = "b64";
    else a.compact = true;
    return this.tool("search_vectors_batch", a).then((r) => {
      if (!binary) return r;
      const rows = Buffer.from(r.rows_b64, "base64");
      const dists = Buffer.from(r.distances_b64, "base64");
      return {
        k: r.k,
        count: r.count,
        rows: new Int32Array(rows.buffer, rows.byteOffset, r.count * r.k),
        distances: new Float32Array(dists.buffer, dists.byteOffset, r.count * r.k),
      };
    });
  }
  /** Fire many single searches concurrently on this one socket. */
  searchMany(store, vectors, k = 10) {
    return Promise.all(vectors.map((v) => this.searchVectors(store, v, k)));
  }
  deleteVector(store, id) {
    return this.tool("delete_vector", { store, id });
  }
  getStoreStats(store) {
    return this.tool("get_store_stats", { store });
  }
  listStores() {
    return this.tool("list_stores", {}).then((r) => r.stores);
  }
  syncStore(store) {
    return this.tool("sync_store", { store });
  }
  backupStore(store, backupName) {
    return this.tool("backup_store", { store, backup_name: backupName });
  }
  restoreStore(backupFile, newName) {
    const a = { backup_file: backupFile };
    if (newName) a.new_name = newName;
    return this.tool("restore_store", a);
  }
  listBackups() {
    return this.tool("list_backups", {}).then((r) => r.backups);
  }
  deleteStore(store) {
    return this.tool("delete_store", { store });
  }
}

module.exports = { VectorDBClient };

// ------------------------------------------------------------------- demo

async function demo() {
  const c = new VectorDBClient({
    mcpPort: Number(process.env.EVDB_MCP_PORT || 8080),
    oauthPort: Number(process.env.EVDB_OAUTH_PORT || 8081),
  });
  await c.connect();
  const info = await c.initialize();
  console.log("server:", info.serverInfo);

  await c.createStore("js_demo", { dimension: 4 });
  await c.insertVector("js_demo", "a", [1, 0, 0, 0], { lang: "en" });
  await c.insertVector("js_demo", "b", [0, 1, 0, 0], { lang: "de" });
  await c.insertVector("js_demo", "c", [0.9, 0.1, 0, 0]);

  const hits = await c.searchVectors("js_demo", [1, 0, 0, 0], 2);
  console.log("top-2:", hits.map((h) => `${h.id}@${h.distance.toFixed(4)}`));

  // pipelined: three searches in flight at once on one socket
  const many = await c.searchMany("js_demo", [[1, 0, 0, 0], [0, 1, 0, 0], [0.9, 0.1, 0, 0]], 1);
  console.log("pipelined top-1s:", many.map((r) => r[0].id));

  // binary batch
  const q = new Float32Array([1, 0, 0, 0, 0, 1, 0, 0]);
  const bin = await c.searchVectorsBatch("js_demo", q, 4, 1, { binary: true });
  console.log("binary batch rows:", Array.from(bin.rows));

  console.log("stats:", await c.getStoreStats("js_demo"));
  await c.deleteStore("js_demo");
  c.close();
}

if (require.main === module) {
  demo().catch((e) => {
    console.error("demo failed:", e.message);
    process.exit(1);
  });
}
