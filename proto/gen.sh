#!/bin/bash
# Regenerate the protobuf message classes (messages only; gRPC service
# handlers are registered by hand in serve/grpc_server.py, so the
# grpc_python_plugin is not needed).
set -e
cd "$(dirname "$0")/.."
protoc -I proto --python_out=erlvectordb_tpu/serve proto/evdb.proto
echo "wrote erlvectordb_tpu/serve/evdb_pb2.py"
