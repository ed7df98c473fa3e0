#!/bin/bash
# Per-round sf0.1 batch parity sweep (r18 verdict item 1): full Verify
# dump at sf0.1, then the DuckDB compare fanned across 4 shards.
# Run from /root/repo; takes hours of DuckDB time — background it.
#   tools/sweep_sf01.sh [outDir]
# Produces $outDir/shard{0..3}.log; "ALL OK" in every log = sweep green.
set -e
OUT=${1:-/tmp/verify_sf01}
rm -rf "$OUT"
sbt -batch "runMain graft.Verify /root/testdata/sf0.1 $OUT" 2>&1 \
  | grep -E "\[verify\].*failed" && echo "SPARK-SIDE FAILURES" || true
for i in 0 1 2 3; do
  GRAFT_DUCKDB_THREADS=8 nohup python3 tools/check_oracle.py \
    /root/testdata/sf0.1 "$OUT" "$i/4" \
    > "$OUT/shard$i.log" 2>&1 &
done
wait
tail -1 "$OUT"/shard*.log
