#!/bin/bash
# Paired same-window bench capture (the r17 re-baseline protocol):
# the commit BENCH_reference.json was captured from, checked out as a
# worktree (git worktree add .refbench <ref-commit>; sbt compile), and
# HEAD run INTERLEAVED R,H,R,H in one window, loadavg-stamped. Each
# invocation writes its full JSON to its tree's BENCH_full.json —
# snapshot each phase before the next overwrites it. Merge rule for
# the committed artifacts (see NOTES r17): per query over the 2x3 raw
# runs, p50 = median of the 3 fastest (drops each invocation's cold
# JIT run), min = min of all 6 — the SAME statistic on both sides.
set -u
log=/tmp/pb_log.txt
: > $log
stamp() { echo "$1 $(date +%T) loadavg=$(cut -d\  -f1-3 /proc/loadavg)" >> $log; }
run_ref()  { (cd /root/repo/.refbench && SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" >/dev/null 2>&1); cp /root/repo/.refbench/BENCH_full.json /tmp/cap_$1.json; }
run_head() { (SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt -batch "runMain graft.Bench" >/dev/null 2>&1); cp /root/repo/BENCH_full.json /tmp/cap_$1.json; }
stamp start
run_ref  R1; stamp R1
run_head H1; stamp H1
run_ref  R2; stamp R2
run_head H2; stamp H2
stamp end
echo PAIRED_DONE: merge /tmp/cap_{R1,R2}.json -> BENCH_reference.json, /tmp/cap_{H1,H2}.json -> BENCH_full.json
