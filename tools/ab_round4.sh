#!/bin/bash
# Round-4 A/B matrix on the real chip (run only while the chip is otherwise
# idle).  Each line = one bench invocation; results append to tools/ab_r4.log
# as the bench's JSON line prefixed with the variant tag.
set -u
cd "$(dirname "$0")/.."
LOG=tools/ab_r4.log
run() {
  tag="$1"; shift
  echo "=== $tag ($(date -u +%H:%M:%SZ))" >> "$LOG"
  # keep stderr: a silent bench failure cost a whole night once (the
  # wait_tpu probe asserted the wrong matmul sum and every run "failed")
  env "$@" python bench.py 2>"tools/ab_r4_${tag}.err" | tail -1 >> "$LOG"
  [ -s "tools/ab_r4_${tag}.err" ] || rm -f "tools/ab_r4_${tag}.err"
}
# 1. baseline re-measure at HEAD (parity=head, 2pass) + MFU
run "head_2pass_b32"
# 2. stems rewrite, now parity-THROUGH-norm (VERDICT item 1)
run "stems_2pass_b32" BENCH_PARITY=stems
# 3. all rewrites
run "all_2pass_b32" BENCH_PARITY=1
# 4. 1pass norm stats with default parity
run "head_1pass_b32" BENCH_NORM_STATS=1pass
# 5. batch-64 default (anomaly re-measure at HEAD)
run "head_2pass_b64" BENCH_BATCH=64
# 5b. batch-128: completes the 32/64/128 scaling curve (VERDICT item 2)
run "head_2pass_b128" BENCH_BATCH=128
# 5c. if the b64 regression is HBM working-set pressure, remat should help
#     at 64 even though it lost at 32 in r2
run "head_2pass_b64_remat" BENCH_BATCH=64 BENCH_REMAT=1
# 6. combined candidate: stems rewrite + 1pass stats
run "stems_1pass_b32" BENCH_PARITY=stems BENCH_NORM_STATS=1pass
echo "=== done ($(date -u +%H:%M:%SZ))" >> "$LOG"
