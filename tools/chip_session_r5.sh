#!/bin/bash
# Round-5 chip session (VERDICT r4 items 2 + 4).
#
# Stage 1: resume the r4 q8k run (configs/celeba_quality_r4.yaml, 1pass
#          winner config) from its 8000-step checkpoint to 14000 — crossing
#          the attention-blend gate at step 10000 (train/step.py) under the
#          SHIPPED config for the first time.
# Stage 2: trend eval at 10k/12k/14k vs quality/quality_trend_r3.json
#          (same-steps rows exist: 10000/12000/14000).
# Stage 3: demo grids — the 6 hand-written commands on BOTH the 8000
#          checkpoint (the artifact quality/r4_q8k/README.md promised) and
#          the post-gate 14000 checkpoint.  The r4 demo failed silently
#          (step-dir passed as checkpoint root, exit=1, no retry); translate
#          now accepts step dirs and this script verifies the output exists.
# Stage 4: second-seed (4321) 8k run of the same config
#          (configs/celeba_quality_r5_seed2.yaml) + trend eval at 2k-8k —
#          two-seed evidence for the 1pass default flip.
#
# Evidence commits incrementally into quality/r5/ (pathspec-scoped).
set -u
cd "$(dirname "$0")/.."
LOG=tools/chip_session_r5.log
note() { echo "[$(date -u +%H:%M:%SZ)] r5: $*" >> "$LOG"; }

wait_tpu() {
  until timeout 300 python -c "
import jax, jax.numpy as jnp
assert float((jnp.ones((64,64))@jnp.ones((64,64))).sum()) == 64.0**3
" 2>/dev/null; do note "TPU still down"; sleep 60; done
  note "TPU up"
}

mkdir -p runs quality/r5
note "=== chip session r5 start"

snapshot() {
  cp -f runs/q4/outputs/celeba_quality_r4/images/test_000?[02468]000.jpg quality/r5/ 2>/dev/null
  tail -n 30 runs/q5_train.log > quality/r5/train_tail.log 2>/dev/null
  git add quality/r5 >/dev/null 2>&1
  git commit -q -m "r5 quality-run progress snapshot (auto)" -- quality/r5 >/dev/null 2>&1 || true
}

# progress watcher (pathspec-scoped commits only)
( while true; do sleep 300; snapshot; done ) &
WATCH=$!
echo "$WATCH" > /tmp/r5_watch.pid

# ---- stage 1: resume 8000 -> 14000 under the shipped 1pass config
for attempt in 1 2 3 4; do
  wait_tpu
  note "q14k attempt $attempt start"
  timeout 5400 python -u -m dwcgan_tpu.cli.train \
    --config configs/celeba_quality_r4.yaml --procedural_data \
    --output_path runs/q4 --resume 1 --max_steps 14000 \
    >> runs/q5_train.log 2>&1
  rc=$?
  note "q14k attempt $attempt exit=$rc"
  [ "$rc" -eq 0 ] && break
  sleep 20
done
kill "$WATCH" 2>/dev/null
snapshot
git commit -q -m "r5: 1pass config trained through the attention gate to 14k" \
  -- quality/r5 >/dev/null 2>&1 || true

# ---- stage 2: trend eval at the post-gate checkpoints
wait_tpu
timeout 7200 python -u tools/quality_eval.py \
  --run_dir runs/q4/outputs/celeba_quality_r4 \
  --config configs/celeba_quality_r4.yaml \
  --steps 10000,12000,14000 \
  --out runs/q5_quality > runs/q5_quality.log 2>&1
note "q14k eval exit=$?"
cp -f runs/q5_quality/quality_trend.json quality/r5/quality_trend_r5_postgate.json 2>/dev/null
cp -f runs/q5_quality/grid_000?[024]000.jpg quality/r5/ 2>/dev/null
python - > quality/r5/trend_vs_r3_postgate.txt 2>&1 <<'PYEOF'
import json
r3 = {r["step"]: r for r in json.load(open("quality/quality_trend_r3.json"))["results"]}
r5 = {r["step"]: r for r in json.load(open("quality/r5/quality_trend_r5_postgate.json"))["results"]}
print("post-gate trend, shipped 1pass config (r5) vs r3 2pass at the same steps")
print("step  | fid_rel r3->r5 | attr_acc r3->r5 | recon_l1 r3->r5")
for s in sorted(r5):
    a, b = r3.get(s), r5[s]
    if a is None:
        continue
    print(f"{s:5d} | {a['fid_rel']:7.3f} -> {b['fid_rel']:7.3f} | "
          f"{a['attr_transfer_acc']:.4f} -> {b['attr_transfer_acc']:.4f} | "
          f"{a['nochange_recon_l1']:.4f} -> {b['nochange_recon_l1']:.4f}")
PYEOF
git add quality/r5 >/dev/null 2>&1
git commit -q -m "r5: post-attention-gate trend eval (10k/12k/14k) vs r3" \
  -- quality/r5 >/dev/null 2>&1 || true

# ---- stage 3: demo grids at 8000 (the r4 README promise) and 14000
demo() {  # $1 = step, $2 = output jpg
  local step=$1 outjpg=$2 outdir
  outdir=$(mktemp -d)
  for try in 1 2; do
    wait_tpu
    timeout 3600 python -u -m dwcgan_tpu.cli.translate \
      --config configs/celeba_quality_r4.yaml \
      --checkpoint runs/q4/outputs/celeba_quality_r4/checkpoints --step "$step" \
      --list tools/demo_faces/cmds.lst --image_dir tools/demo_faces \
      --out_dir "$outdir" >> "$LOG" 2>&1
    note "demo step=$step try=$try exit=$?"
    [ "$(ls "$outdir" 2>/dev/null | wc -l)" -ge 6 ] && break
    sleep 10
  done
  python - "$outdir" "$outjpg" >> "$LOG" 2>&1 <<'PYEOF'
import os, sys
from PIL import Image
outdir, outjpg = sys.argv[1], sys.argv[2]
ins = [f"tools/demo_faces/demo_{i}.png" for i in range(6)]
outs = sorted(os.path.join(outdir, o) for o in os.listdir(outdir))
assert len(outs) >= 6, f"demo outputs missing in {outdir}: {outs}"
sz = 128
pairs = [(Image.open(a).convert("RGB").resize((sz, sz)),
          Image.open(b).convert("RGB").resize((sz, sz)))
         for a, b in zip(ins, outs)]
grid = Image.new("RGB", (sz * 6, sz * 2))
for i, (a, b) in enumerate(pairs):
    grid.paste(a, (i * sz, 0)); grid.paste(b, (i * sz, sz))
grid.save(outjpg, quality=92)
print("demo grid saved:", outjpg)
PYEOF
  if [ ! -f "$outjpg" ]; then note "FATAL: demo grid $outjpg missing"; fi
}

demo 8000  quality/r4_q8k/demo_commands_r4.jpg
demo 14000 quality/r5/demo_commands_r5_14k.jpg
git add quality/r4_q8k quality/r5 >/dev/null 2>&1
git commit -q -m "r5: 6-command demo grids at the 8k (r4 promise) and post-gate 14k checkpoints" \
  -- quality/r4_q8k quality/r5 >/dev/null 2>&1 || true

# ---- stage 4: second seed (4321), 8k steps, same protocol
( while true; do sleep 300
    tail -n 30 runs/q5seed_train.log > quality/r5/seed2_train_tail.log 2>/dev/null
    git add quality/r5 >/dev/null 2>&1
    git commit -q -m "r5 seed2 progress snapshot (auto)" -- quality/r5 >/dev/null 2>&1 || true
  done ) &
WATCH2=$!
echo "$WATCH2" > /tmp/r5_watch.pid
for attempt in 1 2 3 4; do
  wait_tpu
  note "seed2 attempt $attempt start"
  if [ "$attempt" -gt 1 ]; then RESUME="--resume 1"; else RESUME=""; fi
  timeout 5400 python -u -m dwcgan_tpu.cli.train \
    --config configs/celeba_quality_r5_seed2.yaml --procedural_data \
    --output_path runs/q5seed $RESUME --max_steps 8000 \
    >> runs/q5seed_train.log 2>&1
  rc=$?
  note "seed2 attempt $attempt exit=$rc"
  [ "$rc" -eq 0 ] && break
  sleep 20
done
kill "$WATCH2" 2>/dev/null
wait_tpu
timeout 7200 python -u tools/quality_eval.py \
  --run_dir runs/q5seed/outputs/celeba_quality_r5_seed2 \
  --config configs/celeba_quality_r5_seed2.yaml \
  --steps 2000,4000,6000,8000 \
  --out runs/q5seed_quality > runs/q5seed_quality.log 2>&1
note "seed2 eval exit=$?"
cp -f runs/q5seed_quality/quality_trend.json quality/r5/quality_trend_seed2.json 2>/dev/null
python - > quality/r5/two_seed_table.txt 2>&1 <<'PYEOF'
import json
r3 = {r["step"]: r for r in json.load(open("quality/quality_trend_r3.json"))["results"]}
s1 = {r["step"]: r for r in json.load(open("quality/r4_q8k/quality_trend_r4.json"))["results"]}
s2 = {r["step"]: r for r in json.load(open("quality/r5/quality_trend_seed2.json"))["results"]}
print("two-seed 1pass quality gate vs the r3 2pass baseline (VERDICT r4 item 4)")
print("step  | fid_rel: r3-2pass / 1pass-s1234 / 1pass-s4321 | attr_acc: r3 / s1234 / s4321 | recon_l1: r3 / s1234 / s4321")
for s in sorted(s2):
    a, b, c = r3.get(s), s1.get(s), s2[s]
    if a is None or b is None:
        continue
    print(f"{s:5d} | {a['fid_rel']:7.3f} / {b['fid_rel']:7.3f} / {c['fid_rel']:7.3f} | "
          f"{a['attr_transfer_acc']:.4f} / {b['attr_transfer_acc']:.4f} / {c['attr_transfer_acc']:.4f} | "
          f"{a['nochange_recon_l1']:.4f} / {b['nochange_recon_l1']:.4f} / {c['nochange_recon_l1']:.4f}")
PYEOF
git add quality/r5 >/dev/null 2>&1
git commit -q -m "r5: second-seed (4321) 1pass quality trend + two-seed table" \
  -- quality/r5 >/dev/null 2>&1 || true

note "=== chip session r5 DONE"
