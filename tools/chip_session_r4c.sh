#!/bin/bash
# Round-4 chip session, part C — the post-A/B remainder, ADAPTED to the
# VM reset that wiped runs/ (the q3 checkpoint trail 20k..34k is gone, so
# VERDICT r3 items 4 and 8 merge into ONE fresh 50k quality run under the
# A/B-winning step config; the round-3 trend in quality/quality_trend_r3.json
# stays the comparison baseline — same config, data, seed, eval protocol).
#
# Stages (serial; 1 core + 1 chip):
#   1. per-op profiles: train b32 vs b64, serving b128 vs b256
#   2. penalty-path evidence runs: n_critic=2, use_r1, gp_w=10 (3k steps)
#   3. fresh 50k quality run under configs/celeba_quality_r4.yaml
#      (written by the A/B decision step before this script runs)
#   4. trend eval at 2k..50k + the 6-command demo on the 50k checkpoint
# Training stages retry through relay wedges via lossless Orbax resume.
set -u
cd "$(dirname "$0")/.."
LOG=tools/chip_session_r4.log
note() { echo "[$(date -u +%H:%M:%SZ)] r4c: $*" >> "$LOG"; }

wait_tpu() {
  until timeout 300 python -c "
import jax, jax.numpy as jnp
assert float((jnp.ones((64,64))@jnp.ones((64,64))).sum()) == 64.0**3
" 2>/dev/null; do note "TPU still down"; sleep 120; done
  note "TPU up"
}

run_train() {
  tag="$1"; tmo="$2"; shift 2
  for attempt in 1 2 3 4 5; do
    wait_tpu
    note "$tag attempt $attempt start"
    if [ "$attempt" -gt 1 ]; then
      timeout "$tmo" python -u -m dwcgan_tpu.cli.train "$@" --resume 1 \
        >> "runs/${tag}_train.log" 2>&1
    else
      timeout "$tmo" python -u -m dwcgan_tpu.cli.train "$@" \
        >> "runs/${tag}_train.log" 2>&1
    fi
    rc=$?
    note "$tag attempt $attempt exit=$rc"
    [ "$rc" -eq 0 ] && return 0
    sleep 30
  done
  note "$tag FAILED after 5 attempts"
  return 1
}

mkdir -p runs
note "=== chip session r4c start"

# 1. profiles: train b32 vs b64 (VERDICT item 2), serving b128 vs b256
for b in 32 64; do
  wait_tpu
  timeout 3600 python -u tools/profile_step.py --trace_dir "/tmp/trace_b$b" \
    --batch "$b" --out "tools/profile_b$b.json" \
    > "tools/profile_b$b.log" 2>&1
  note "train profile b$b exit=$?"
done
for b in 128 256; do
  wait_tpu
  timeout 3600 python -u tools/profile_step.py --mode infer \
    --trace_dir "/tmp/trace_inf$b" --batch "$b" \
    --out "tools/profile_infer_b$b.json" \
    > "tools/profile_infer_b$b.log" 2>&1
  note "infer profile b$b exit=$?"
done

# 2. penalty-path evidence runs (VERDICT r3 item 3)
for pen in ncritic2 r1 gp; do
  run_train "pen_$pen" 7200 \
    --config "configs/pen_$pen.yaml" --procedural_data \
    --output_path "runs/pen_$pen"
done

# 3. fresh quality run to 50k under the round-4 winner config
for attempt in 1 2 3 4 5 6 7 8; do
  wait_tpu
  note "q4 attempt $attempt start"
  if [ "$attempt" -gt 1 ]; then
    timeout 14400 python -u -m dwcgan_tpu.cli.train \
      --config configs/celeba_quality_r4.yaml --procedural_data \
      --output_path runs/q4 --resume 1 --max_steps 50000 \
      >> runs/q4_train.log 2>&1
  else
    timeout 14400 python -u -m dwcgan_tpu.cli.train \
      --config configs/celeba_quality_r4.yaml --procedural_data \
      --output_path runs/q4 --max_steps 50000 \
      >> runs/q4_train.log 2>&1
  fi
  rc=$?
  note "q4 attempt $attempt exit=$rc"
  [ "$rc" -eq 0 ] && break
  sleep 30
done

# 4. trend eval + demo
wait_tpu
timeout 10800 python -u tools/quality_eval.py \
  --run_dir runs/q4/outputs/celeba_quality_r4 \
  --config configs/celeba_quality_r4.yaml \
  --steps 2000,4000,8000,12000,16000,20000,28000,36000,44000,50000 \
  --out runs/q4_quality > runs/q4_quality.log 2>&1
note "q4 eval exit=$?"
wait_tpu
timeout 3600 python -u -m dwcgan_tpu.cli.translate \
  --config configs/celeba_quality_r4.yaml \
  --checkpoint runs/q4/outputs/celeba_quality_r4/checkpoints/50000 \
  --list tools/demo_faces/cmds.lst --image_dir tools/demo_faces \
  --out_dir /tmp/demo_out_r4 > /tmp/demo_r4.log 2>&1
note "demo translate exit=$?"
python - >> "$LOG" 2>&1 <<'PYEOF'
from PIL import Image
import os
ins = [f"tools/demo_faces/demo_{i}.png" for i in range(6)]
outs = sorted(os.listdir("/tmp/demo_out_r4"))
outs = [os.path.join("/tmp/demo_out_r4", o) for o in outs]
pairs = [(Image.open(a), Image.open(b)) for a, b in zip(ins, outs)]
w, h = pairs[0][0].size
grid = Image.new("RGB", (w * 6, h * 2))
for i, (a, b) in enumerate(pairs):
    grid.paste(a, (i * w, 0)); grid.paste(b, (i * w, h))
grid.save("quality/demo_commands_r4.jpg", quality=92)
print("demo grid saved: quality/demo_commands_r4.jpg")
PYEOF

note "=== chip session r4c DONE"
