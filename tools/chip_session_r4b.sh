#!/bin/bash
# Round-4 follow-up chip stage: runs AFTER tools/chip_session_r4.sh logs its
# DONE marker.  Decides the norm_stats winner from the A/B matrix and, if
# 1pass won at batch 32, runs the 12k quality replication under 1pass
# (VERDICT r3 item 4's "quality trend unchanged" half) + its trend eval.
# Writes a one-line decision to tools/ab_r4_decision.txt either way.
set -u
cd "$(dirname "$0")/.."
LOG=tools/chip_session_r4.log
note() { echo "[$(date -u +%H:%M:%SZ)] r4b: $*" >> "$LOG"; }

until grep -q "chip session r4 queue DONE" "$LOG"; do sleep 120; done
note "main queue done, evaluating norm-stats A/B"

wait_tpu() {
  until timeout 300 python -c "
import jax, jax.numpy as jnp
assert float((jnp.ones((64,64))@jnp.ones((64,64))).sum()) == 64.0**3
" 2>/dev/null; do note "TPU still down"; sleep 120; done
}

python - <<'PYEOF'
import json, re

rows = {}
tag = None
for line in open("tools/ab_r4.log"):
    line = line.strip()
    m = re.match(r"=== (\S+)", line)
    if m:
        tag = m.group(1)
    elif line.startswith("{") and tag:
        try:
            rows[tag] = json.loads(line)
        except json.JSONDecodeError:
            pass
base = rows.get("head_2pass_b32", {}).get("value", 0)
one = rows.get("head_1pass_b32", {}).get("value", 0)
verdict = "1pass" if one > base else "2pass"
with open("tools/ab_r4_decision.txt", "w") as f:
    f.write(f"norm_stats winner at b32: {verdict} "
            f"(2pass={base} img/s, 1pass={one} img/s)\n")
print(verdict)
PYEOF
WINNER=$(python -c "print(open('tools/ab_r4_decision.txt').read().split()[4])")
note "norm-stats winner: $WINNER (tools/ab_r4_decision.txt)"

if [ "$WINNER" = "1pass" ]; then
  for attempt in 1 2 3 4 5; do
    wait_tpu
    note "q1pass attempt $attempt start"
    if [ "$attempt" -gt 1 ]; then
      timeout 14400 python -u -m dwcgan_tpu.cli.train \
        --config configs/celeba_quality_1pass.yaml --procedural_data \
        --output_path runs/q1pass --resume 1 \
        >> runs/q1pass_train.log 2>&1
    else
      timeout 14400 python -u -m dwcgan_tpu.cli.train \
        --config configs/celeba_quality_1pass.yaml --procedural_data \
        --output_path runs/q1pass \
        >> runs/q1pass_train.log 2>&1
    fi
    rc=$?
    note "q1pass attempt $attempt exit=$rc"
    [ "$rc" -eq 0 ] && break
    sleep 30
  done
  wait_tpu
  timeout 7200 python -u tools/quality_eval.py \
    --run_dir runs/q1pass/outputs/celeba_quality_1pass \
    --config configs/celeba_quality_1pass.yaml \
    --steps 4000,8000,12000 --out runs/q1pass_quality \
    > runs/q1pass_quality.log 2>&1
  note "q1pass eval exit=$?"
else
  note "1pass lost at b32 -> negative result; no replication needed"
fi
note "=== r4b follow-up DONE"
