#!/usr/bin/env bash
# Deliberate-contention check of the bench harness's self-flagging (r16).
#
# The r14 and r15 driver bench records were host-contaminated while every
# canary read healthy: the old canary was pure-CPU, blind to shuffle/disk/
# scheduler contention (another JVM's I/O, page-cache eviction). This script
# reproduces that failure mode ON PURPOSE — a narrowed bench runs with
# tightly interleaved canaries while, mid-run, a second shuffle-heavy Spark
# JVM plus a bank of CPU spinners and direct-I/O writers hammer the host for
# a fixed window — and asserts the record FLAGS ITSELF: the contaminated
# windows' queries appear in degraded_window_queries (and got a recovery
# run), or the whole record reads host_degraded.
#
# Usage: scripts/contention_test.sh   (takes ~2-4 min; needs sf0.01+sf0.1)
set -euo pipefail
cd "$(dirname "$0")/.."

SF=${SPARK_GRAFT_SF_DIR:-/root/testdata/sf0.01}
HOG_SF=${HOG_SF:-/root/testdata/sf0.1}
OUT=/tmp/graft_contention_bench.json
HOG_START=${HOG_START:-14}   # seconds into the run the contention begins
HOG_SECS=${HOG_SECS:-30}     # how long it lasts

# a dozen mixed queries, canaries bracketing every 2 -> ~7 windows, so the
# contention window is a MINORITY of samples and the healthy median holds
QUERIES="q1_agg,q3_top_revenue,q_topn,t_tokens,t_quality,t_langid,d_exact_dedup,d_exact_groups,q_filter_pushdown,q_set_union,t_fingerprint,q_mode"

rm -f "$OUT"
SPARK_GRAFT_SF_DIR="$SF" SPARK_GRAFT_BENCH_ONLY="$QUERIES" \
  SPARK_GRAFT_CANARY_EVERY=2 SPARK_GRAFT_BENCH_OUT="$OUT" \
  scripts/run.sh graft.Bench >/dev/null 2>&1 &
BENCH_PID=$!

HOG_PIDS=()
cleanup() {
  kill "${HOG_PIDS[@]}" >/dev/null 2>&1 || true
  pkill -f graft_hog_ >/dev/null 2>&1 || true
  rm -f /tmp/graft_hog_*
  kill "$BENCH_PID" >/dev/null 2>&1 || true
}
trap cleanup EXIT

sleep "$HOG_START"
echo "[contention] starting hogs (shuffle-heavy JVM + cpu spinners + direct-io writers)"
# a second Spark JVM doing real shuffles/spills — the r15 contamination class
SPARK_GRAFT_SF_DIR="$HOG_SF" SPARK_GRAFT_BENCH_ONLY=d_minhash_exact,g_pagerank \
  SPARK_GRAFT_BENCH_OUT=/tmp/graft_hog_bench.json \
  scripts/run.sh graft.Bench >/dev/null 2>&1 &
HOG_PIDS+=($!)
for i in $(seq 1 64); do
  ( exec -a graft_hog_spin bash -c 'while :; do :; done' ) & HOG_PIDS+=($!)
done
for i in $(seq 1 16); do
  ( exec -a graft_hog_dd bash -c \
    "while :; do dd if=/dev/zero of=/tmp/graft_hog_$i bs=4M count=128 oflag=direct 2>/dev/null; done" ) &
  HOG_PIDS+=($!)
done

sleep "$HOG_SECS"
echo "[contention] stopping hogs"
kill "${HOG_PIDS[@]}" >/dev/null 2>&1 || true
pkill -f graft_hog_ >/dev/null 2>&1 || true
rm -f /tmp/graft_hog_*
HOG_PIDS=()

wait "$BENCH_PID"

python3 - "$OUT" <<'EOF'
import json, sys
rec = json.load(open(sys.argv[1]))
print("canaries cpu:", rec["canaries"])
print("canaries io :", rec["canaries_io"])
print("host_degraded:", rec["host_degraded"])
print("degraded_window_queries:", rec["degraded_window_queries"])
flagged = bool(rec["degraded_window_queries"]) or rec["host_degraded"]
assert flagged, "CONTENTION NOT FLAGGED - the canary blind spot is back"
# flagged queries must carry the extra recovery sample in raw
for q in rec["degraded_window_queries"]:
    assert len(rec["raw"][q]) >= 3, f"{q} flagged but got no recovery run"
print("OK: contamination flagged itself and recovery ran")
EOF
