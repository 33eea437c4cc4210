#!/usr/bin/env bash
# End-to-end smoke of the snapshot-table CLI surface against real testdata:
# create -> append -> merge-on-read delete -> manifest count -> changelog ->
# shallow clone -> maintain -> SQL over the planner-integrated view ->
# WARC ingest (externally-written gzip WARC). Exercises the command paths
# the ScalaTest specs reach only as library calls.
#
# Usage: bash tools/cli_smoke.sh   (after `sbt compile`; ~1 min)
set -euo pipefail
cd "$(dirname "$0")/.."
W=/tmp/graft/cli_smoke
rm -rf "$W" && mkdir -p "$W"
CP="target/scala-2.13/classes:$(ls /opt/spark/jars/*.jar | tr '\n' ':')"
G() { java -cp "$CP" -Xmx4g graft.cli.GraftCli "$@" 2>/dev/null; }
T=$W/tbl

python3 - << 'PY'
import duckdb, gzip
duckdb.sql("COPY (SELECT * FROM '/root/testdata/sf0.001/documents.parquet') TO '/tmp/graft/cli_smoke/docs.parquet'")
rows = duckdb.sql("SELECT doc_id, text FROM '/root/testdata/sf0.001/documents.parquet' LIMIT 50").fetchall()
with gzip.open('/tmp/graft/cli_smoke/crawl.warc.gz', 'wb') as f:
    for doc_id, text in rows:
        body = text.encode()
        f.write((f"WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: https://t/{doc_id}\r\n"
                 f"WARC-Date: 2024-01-01T00:00:00Z\r\nContent-Type: text/plain\r\n"
                 f"Content-Length: {len(body)}\r\n\r\n").encode())
        f.write(body); f.write(b"\r\n\r\n")
PY

G snapshot-create "$T"
G snapshot-append "$T" "$W/docs.parquet"
G snapshot-delete-mor "$T" "n_chars < 150"
G snapshot-count "$T"
G snapshot-changes "$T" 0 2
G snapshot-clone "$T" "$W/clone"
G snapshot-maintain "$T" 1000000 1
G snapshot-sql "$T" docs "SELECT count(*) AS n FROM docs WHERE n_chars >= 150" | tail -4
G warc-ingest "$W/*.warc.gz" "$W/crawl_tbl"
# crawl -> search: keep a BM25 index current with the WARC table's commits
M1=$(G text-index-refresh "$W/crawl_tbl" "$W/crawl_idx" "$W/crawl_idx_cur")
M2=$(G text-index-refresh "$W/crawl_tbl" "$W/crawl_idx" "$W/crawl_idx_cur")
[[ "$M1" == *"mode=rebuild"* && "$M2" == *"mode=noop"* ]] \
  || { echo "index refresh modes wrong: $M1 / $M2"; exit 1; }
# record a clustering discipline, then stream the table's changelog twice
# (second run must be a no-op continuation from the checkpoint's offset)
G snapshot-cluster "$T" doc_id --limit=200
G snapshot-stream "$T" "$W/feed" "$W/feed_ckpt"
G snapshot-append "$T" "$W/docs.parquet"
G snapshot-stream "$T" "$W/feed" "$W/feed_ckpt"
python3 - << 'PY'
import duckdb
n = duckdb.sql("SELECT count(*) FROM '/tmp/graft/cli_smoke/feed/*.parquet'").fetchone()[0]
t = duckdb.sql("SELECT count(*) FROM '/root/testdata/sf0.001/documents.parquet'").fetchone()[0]
kept = duckdb.sql("SELECT count(*) FROM '/root/testdata/sf0.001/documents.parquet' WHERE n_chars >= 150").fetchone()[0]
# feed = initial snapshot (kept rows, clustered replace emits nothing) + second append as changelog
assert n == kept + t, f"feed rows {n} != {kept}+{t}"
PY
echo "cli_smoke: OK"
