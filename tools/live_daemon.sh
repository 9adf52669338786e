#!/bin/bash
# Run the graft daemon (graft.Main) as a real process against the live
# PostgreSQL stood up by tools/live_pg.sh: replication dial over TLS+SCRAM
# -> commit-aligned segments -> Spark structured streaming -> vector
# pipeline (deterministic embedder) -> parquet oplog sink, with /healthz
# and /metrics served live, then a SIGTERM graceful shutdown. Verifies the
# oplog's last-writer-wins state matches the table operations.
set -euo pipefail
cd /root/repo

ROOT=/tmp/graft-daemon
rm -rf "$ROOT"; mkdir -p "$ROOT/wal"
export GRAFT_PG_PASSWORD=graft-secret-pw
PSQL=(env PGPASSWORD=$GRAFT_PG_PASSWORD psql -h 127.0.0.1 -p 54329 -U postgres -qAt)

"${PSQL[@]}" -c "SELECT pg_drop_replication_slot('graft_daemon')" 2>/dev/null || true
"${PSQL[@]}" -c "DROP TABLE IF EXISTS documents"
"${PSQL[@]}" -c "DROP PUBLICATION IF EXISTS graft_daemon_pub"
"${PSQL[@]}" -c "CREATE TABLE documents(id int primary key, title text,
  content text, created_at text, author text)"
"${PSQL[@]}" -c "CREATE PUBLICATION graft_daemon_pub FOR TABLE documents"

cat > "$ROOT/config.yaml" <<EOF
source:
  type: postgres
  dir: $ROOT/wal
  checkpoint_dir: $ROOT/ckpt
  postgres:
    host: 127.0.0.1
    port: 54329
    user: postgres
    database: postgres
    password_env: GRAFT_PG_PASSWORD
    ssl_mode: require
    slot: graft_daemon
    publication: graft_daemon_pub
    create_publication: false
    create_slot: true
embedding:
  provider: deterministic
  vector_size: 64
sink:
  type: parquet
pipeline:
  batch_size: 64
  flush_interval_ms: 500
http:
  addr: :18099
mappings:
  - table: public.documents
    id_column: id
    text_columns: [title, content]
    metadata_columns: [created_at, author]
EOF

sbt -batch compile >/dev/null

ADDOPENS=""
for p in java.lang java.lang.invoke java.lang.reflect java.io java.net \
         java.nio java.util java.util.concurrent java.util.concurrent.atomic \
         sun.nio.ch sun.nio.cs sun.security.action sun.util.calendar; do
  ADDOPENS="$ADDOPENS --add-opens java.base/$p=ALL-UNNAMED"
done

java $ADDOPENS -Dspark.ui.enabled=false -Xmx8g \
  -cp "target/scala-2.13/classes:/opt/spark/jars/*" \
  graft.Main "$ROOT/config.yaml" "$ROOT/store" \
  > "$ROOT/daemon.log" 2>&1 &
PID=$!
trap 'kill -9 $PID 2>/dev/null || true' EXIT

for i in $(seq 1 90); do
  curl -fsS localhost:18099/healthz >/dev/null 2>&1 && break; sleep 1
done
if ! curl -fsS localhost:18099/healthz >/dev/null 2>&1; then
  echo "daemon never became healthy; last log lines:"
  tail -50 "$ROOT/daemon.log"; exit 1
fi
echo "healthz: $(curl -fsS localhost:18099/healthz)"

"${PSQL[@]}" -c "INSERT INTO documents SELECT g, 'title '||g, 'content '||g,
  '2026-01-01', 'author'||(g%5) FROM generate_series(1,200) g"
"${PSQL[@]}" -c "UPDATE documents SET content='updated '||id WHERE id <= 40"
"${PSQL[@]}" -c "DELETE FROM documents WHERE id BETWEEN 41 AND 60"

# wait until the oplog's last-writer-wins state reflects all three
# transactions: 180 live ids, >= 20 delete markers
python3 - "$ROOT/store/oplog" <<'PYEOF'
import duckdb, glob, sys, time
path = sys.argv[1]
deadline = time.time() + 120
while time.time() < deadline:
    files = glob.glob(path + "/*.parquet")
    if files:
        try:
            live, dels = duckdb.sql(f"""
              SELECT count(*) FILTER (op = 'upsert'),
                     (SELECT count(*) FROM read_parquet('{path}/*.parquet')
                      WHERE op = 'delete')
              FROM (SELECT id, arg_max(op, batch_id) AS op
                    FROM read_parquet('{path}/*.parquet') GROUP BY id)
            """).fetchone()
            if live == 180 and dels >= 20:
                print(f"oplog converged: live={live} delete_markers={dels}")
                sys.exit(0)
        except duckdb.Error:
            pass  # half-written file mid-append; retry
    time.sleep(2)
sys.exit("oplog did not converge to 180 live ids")
PYEOF

echo "metrics: $(curl -fsS localhost:18099/metrics)"

kill -TERM $PID
for i in $(seq 1 30); do kill -0 $PID 2>/dev/null || break; sleep 1; done
if kill -0 $PID 2>/dev/null; then echo "daemon did not exit on SIGTERM"; exit 1; fi
trap - EXIT
echo "daemon exited cleanly on SIGTERM"
"${PSQL[@]}" -c "SELECT pg_drop_replication_slot('graft_daemon')" 2>/dev/null || true
echo OK
