#!/bin/bash
# Round-4 final stretch.  The q4 50k quality run has now been killed TWICE
# by VM resets (runs/ is wiped on every reset — step 35000 the first time,
# ~mid-run the second).  This bounded replay trains the A/B-winning config
# (configs/celeba_quality_r4.yaml: norm_stats 1pass, parity head) to 8000
# steps, evals the trend at 2k/4k/6k/8k against quality/quality_trend_r3.json
# (same recipe/data/seed/eval protocol), runs the 6-command demo on the 8k
# checkpoint, and COMMITS evidence into quality/r4_q8k/ incrementally so a
# reset cannot wipe it a third time.
set -u
cd "$(dirname "$0")/.."
LOG=tools/chip_session_r4.log
note() { echo "[$(date -u +%H:%M:%SZ)] r4d: $*" >> "$LOG"; }

wait_tpu() {
  until timeout 300 python -c "
import jax, jax.numpy as jnp
assert float((jnp.ones((64,64))@jnp.ones((64,64))).sum()) == 64.0**3
" 2>/dev/null; do note "TPU still down"; sleep 60; done
  note "TPU up"
}

mkdir -p runs quality/r4_q8k
note "=== chip session r4d start"

# progress watcher: every 4 min, snapshot new sample grids + log tail into
# the tracked quality/ path and commit (pathspec-scoped so it cannot sweep
# up unrelated staged work).
(
  while true; do
    sleep 240
    cp -f runs/q4/outputs/celeba_quality_r4/images/*.jpg quality/r4_q8k/ 2>/dev/null
    tail -n 30 runs/q4_train.log > quality/r4_q8k/train_tail.log 2>/dev/null
    git add quality/r4_q8k >/dev/null 2>&1
    git commit -q -m "q8k progress snapshot (auto)" -- quality/r4_q8k >/dev/null 2>&1 || true
  done
) &
WATCH=$!
echo "$WATCH" > /tmp/q8k_watch.pid

# stage 1: train to 8000 (resume through relay wedges)
for attempt in 1 2 3 4; do
  wait_tpu
  note "q8k attempt $attempt start"
  if [ "$attempt" -gt 1 ]; then
    timeout 3600 python -u -m dwcgan_tpu.cli.train \
      --config configs/celeba_quality_r4.yaml --procedural_data \
      --output_path runs/q4 --resume 1 --max_steps 8000 \
      >> runs/q4_train.log 2>&1
  else
    timeout 3600 python -u -m dwcgan_tpu.cli.train \
      --config configs/celeba_quality_r4.yaml --procedural_data \
      --output_path runs/q4 --max_steps 8000 \
      >> runs/q4_train.log 2>&1
  fi
  rc=$?
  note "q8k attempt $attempt exit=$rc"
  [ "$rc" -eq 0 ] && break
  sleep 20
done
kill "$WATCH" 2>/dev/null
cp -f runs/q4/outputs/celeba_quality_r4/images/*.jpg quality/r4_q8k/ 2>/dev/null
tail -n 30 runs/q4_train.log > quality/r4_q8k/train_tail.log 2>/dev/null
git add quality/r4_q8k >/dev/null 2>&1
git commit -q -m "q8k (1pass winner config): training done, grids through 8k" \
  -- quality/r4_q8k >/dev/null 2>&1 || true

# stage 2: trend eval at the saved checkpoints, diff vs the r3 trend
wait_tpu
timeout 5400 python -u tools/quality_eval.py \
  --run_dir runs/q4/outputs/celeba_quality_r4 \
  --config configs/celeba_quality_r4.yaml \
  --steps 2000,4000,6000,8000 \
  --out runs/q4_quality > runs/q4_quality.log 2>&1
note "q8k eval exit=$?"
cp -f runs/q4_quality/quality_trend.json quality/r4_q8k/quality_trend_r4.json 2>/dev/null
python - > quality/r4_q8k/trend_vs_r3.txt 2>&1 <<'PYEOF'
import json
r3 = {r["step"]: r for r in json.load(open("quality/quality_trend_r3.json"))["results"]}
r4 = {r["step"]: r for r in json.load(open("quality/r4_q8k/quality_trend_r4.json"))["results"]}
print("step | fid_rel r3->r4 | attr_acc r3->r4 | recon_l1 r3->r4")
for s in sorted(r4):
    a, b = r3.get(s), r4[s]
    if a is None:
        continue
    print(f"{s:5d} | {a['fid_rel']:7.3f} -> {b['fid_rel']:7.3f} | "
          f"{a['attr_transfer_acc']:.4f} -> {b['attr_transfer_acc']:.4f} | "
          f"{a['nochange_recon_l1']:.4f} -> {b['nochange_recon_l1']:.4f}")
PYEOF
git add quality/r4_q8k >/dev/null 2>&1
git commit -q -m "q8k trend eval: 1pass config vs r3 2pass trend at 2k-8k" \
  -- quality/r4_q8k >/dev/null 2>&1 || true

# stage 3: 6-command demo on the 8k checkpoint
wait_tpu
timeout 3600 python -u -m dwcgan_tpu.cli.translate \
  --config configs/celeba_quality_r4.yaml \
  --checkpoint runs/q4/outputs/celeba_quality_r4/checkpoints/8000 \
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
grid.save("quality/r4_q8k/demo_commands_r4.jpg", quality=92)
print("demo grid saved: quality/r4_q8k/demo_commands_r4.jpg")
PYEOF
git add quality/r4_q8k >/dev/null 2>&1
git commit -q -m "q8k demo: 6 hand-written commands on the 8k checkpoint" \
  -- quality/r4_q8k >/dev/null 2>&1 || true

note "=== chip session r4d DONE"
