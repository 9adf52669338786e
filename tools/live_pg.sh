#!/bin/bash
# Stand up a disposable PostgreSQL 15 wal_level=logical instance and run the
# gated live-server specs (LivePostgresSpec: smoke + 1,150-change soak with
# flush-acked outage + confirmed_flush resume) against it — over plain
# SCRAM-SHA-256 and again over TLS (where the server offers
# SCRAM-SHA-256-PLUS and the client binds the channel per RFC 5929).
#
# Requires: postgresql-15 server binaries (initdb/pg_ctl/postgres), openssl,
# a root shell (the server itself runs as the `postgres` system user).
# Everything lives under /tmp/graft-pg; re-running cleans and restarts.
set -euo pipefail

PGROOT=/tmp/graft-pg
PORT=54329
PW=graft-secret-pw

su postgres -s /bin/bash -c "/usr/local/bin/pg_ctl -D $PGROOT/data stop" 2>/dev/null || true
rm -rf "$PGROOT"; mkdir -p "$PGROOT"
echo "$PW" > "$PGROOT/pwfile"
chown -R postgres:postgres "$PGROOT"

su postgres -s /bin/bash -c \
  "/usr/local/bin/initdb -D $PGROOT/data --auth=scram-sha-256 \
     --username=postgres --pwfile=$PGROOT/pwfile" >/dev/null

# self-signed TLS identity (SAN localhost + 127.0.0.1)
openssl req -x509 -newkey rsa:2048 -sha256 -days 7300 -nodes \
  -keyout "$PGROOT/server.key" -out "$PGROOT/server.crt" \
  -subj "/CN=localhost" \
  -addext "subjectAltName=DNS:localhost,IP:127.0.0.1" 2>/dev/null
chown postgres:postgres "$PGROOT"/server.{key,crt}
chmod 600 "$PGROOT/server.key"

cat >> "$PGROOT/data/postgresql.conf" <<EOF
wal_level = logical
max_replication_slots = 8
max_wal_senders = 8
listen_addresses = '127.0.0.1'
port = $PORT
unix_socket_directories = '$PGROOT'
ssl = on
ssl_cert_file = '$PGROOT/server.crt'
ssl_key_file = '$PGROOT/server.key'
EOF
cat >> "$PGROOT/data/pg_hba.conf" <<EOF
host    all             all             127.0.0.1/32            scram-sha-256
host    replication     all             127.0.0.1/32            scram-sha-256
EOF

su postgres -s /bin/bash -c \
  "/usr/local/bin/pg_ctl -D $PGROOT/data -l $PGROOT/log start"

export GRAFT_PG_HOST=127.0.0.1 GRAFT_PG_PORT=$PORT \
       GRAFT_PG_USER=postgres GRAFT_PG_DB=postgres GRAFT_PG_PASSWORD=$PW

echo "=== live specs, sslmode=disable (plain SCRAM-SHA-256)"
GRAFT_PG_SSLMODE=disable sbt -batch \
  "testOnly graft.LivePostgresSpec graft.LiveTopologySpec"
echo "=== live specs, sslmode=require (TLS + SCRAM-SHA-256-PLUS binding)"
GRAFT_PG_SSLMODE=require sbt -batch \
  "testOnly graft.LivePostgresSpec graft.LiveTopologySpec"
echo "=== live specs, sslmode=verify-full (chain + hostname, sslrootcert)"
GRAFT_PG_SSLMODE=verify-full GRAFT_PG_SSLROOTCERT=$PGROOT/server.crt \
  sbt -batch "testOnly graft.LivePostgresSpec graft.LiveTopologySpec"
# LiveTopologySpec's gated test is the FULL production composition against
# the live server: dial → slot → receive loop → commit-aligned segments →
# graft-pgoutput readStream → LSN-monotonic merge store, asserted equal to
# the server's own table across a mid-stream disconnect + slot resume.
