#!/bin/bash
# Round-5 chip session, part C: the 50k-step horizon (r3 item 8, r4
# "environment-blocked" carry-over).
#
# configs/celeba_quality_r4.yaml was written for max_iter 50000
# (ckpt_keep 26 covers the full trail at snapshot cadence 2000); prior
# rounds only ever reached 35k before a relay outage wiped runs/.  This
# session resumes the shipped-1pass-config run (now at 20000) all the way
# to 50000 — the full-budget soak of every default lever at once (1pass
# stats, shared G forward, parity head, attention blending active since
# 10k, FiniteGuard, lossless resume across attempts).
#
# Stage 1: resume 20000 -> 50000 (multiple bounded attempts; each restart
#          exercises lossless resume).
# Stage 2: trend eval at 24k/30k/36k/42k/50k (r3 has no rows past 20k, so
#          these rows are absolute, not comparative: the claim under test
#          is long-horizon stability, not superiority).
# Stage 3: 6-command demo grid at 50000.
set -u
cd "$(dirname "$0")/.."
LOG=tools/chip_session_r5c.log
note() { echo "[$(date -u +%H:%M:%SZ)] r5c: $*" >> "$LOG"; }

wait_tpu() {
  until timeout 300 python -c "
import jax, jax.numpy as jnp
assert float((jnp.ones((64,64))@jnp.ones((64,64))).sum()) == 64.0**3
" 2>/dev/null; do note "TPU still down"; sleep 60; done
  note "TPU up"
}

mkdir -p runs quality/r5
note "=== chip session r5c start"

snapshot() {
  tail -n 30 runs/q5_train.log > quality/r5/train_tail.log 2>/dev/null
  git add quality/r5 >/dev/null 2>&1
  git commit -q -m "r5c 50k-run progress snapshot (auto)" -- quality/r5 >/dev/null 2>&1 || true
}

( while true; do sleep 600; snapshot; done ) &
WATCH=$!
echo "$WATCH" > /tmp/r5c_watch.pid

# ---- stage 1: resume 20000 -> 50000
for attempt in 1 2 3 4 5 6; do
  wait_tpu
  note "q50k attempt $attempt start"
  timeout 7200 python -u -m dwcgan_tpu.cli.train \
    --config configs/celeba_quality_r4.yaml --procedural_data \
    --output_path runs/q4 --resume 1 --max_steps 50000 \
    >> runs/q5_train.log 2>&1
  rc=$?
  note "q50k attempt $attempt exit=$rc"
  [ "$rc" -eq 0 ] && break
  sleep 20
done
kill "$WATCH" 2>/dev/null
snapshot
git commit -q -m "r5c: shipped 1pass config trained to 50k" -- quality/r5 >/dev/null 2>&1 || true

# ---- stage 2: trend eval over the long-horizon checkpoints
wait_tpu
timeout 10800 python -u tools/quality_eval.py \
  --run_dir runs/q4/outputs/celeba_quality_r4 \
  --config configs/celeba_quality_r4.yaml \
  --steps 24000,30000,36000,42000,50000 \
  --out runs/q5c_quality > runs/q5c_quality.log 2>&1
note "q50k eval exit=$?"
python - >> "$LOG" 2>&1 <<'PYEOF'
import json
a = json.load(open("quality/r5/quality_trend_r5_postgate.json"))
b = json.load(open("runs/q5c_quality/quality_trend.json"))
seen = {r["step"] for r in a["results"]}
a["results"] += [r for r in b["results"] if r["step"] not in seen]
a["results"].sort(key=lambda r: r["step"])
with open("quality/r5/quality_trend_r5_postgate.json", "w") as f:
    json.dump(a, f, indent=1)
    f.write("\n")
print("merged trend steps:", [r["step"] for r in a["results"]])
PYEOF
python - > quality/r5/trend_50k.txt 2>&1 <<'PYEOF'
import json
rows = json.load(open("quality/r5/quality_trend_r5_postgate.json"))["results"]
print("50k-horizon trend, shipped 1pass config (configs/celeba_quality_r4.yaml)")
print("r3's trend stops at 20000; rows past that are absolute (stability, not comparison)")
print("step  | fid_rel | attr_acc | recon_l1")
for r in rows:
    if r["step"] < 10000:
        continue
    print(f"{r['step']:5d} | {r['fid_rel']:7.3f} | {r['attr_transfer_acc']:.4f} | "
          f"{r['nochange_recon_l1']:.4f}")
PYEOF
cp -f runs/q5c_quality/grid_00050000.jpg quality/r5/ 2>/dev/null
git add quality/r5 >/dev/null 2>&1
git commit -q -m "r5c: 50k-horizon trend eval (24k-50k) under the shipped config" \
  -- quality/r5 >/dev/null 2>&1 || true

# ---- stage 3: demo grid at 50000
outdir=$(mktemp -d)
for try in 1 2; do
  wait_tpu
  timeout 3600 python -u -m dwcgan_tpu.cli.translate \
    --config configs/celeba_quality_r4.yaml \
    --checkpoint runs/q4/outputs/celeba_quality_r4/checkpoints --step 50000 \
    --list tools/demo_faces/cmds.lst --image_dir tools/demo_faces \
    --out_dir "$outdir" >> "$LOG" 2>&1
  note "demo step=50000 try=$try exit=$?"
  [ "$(ls "$outdir" 2>/dev/null | wc -l)" -ge 6 ] && break
  sleep 10
done
python - "$outdir" quality/r5/demo_commands_r5_50k.jpg >> "$LOG" 2>&1 <<'PYEOF'
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
if [ ! -f quality/r5/demo_commands_r5_50k.jpg ]; then
  note "FATAL: demo grid quality/r5/demo_commands_r5_50k.jpg missing"
fi
git add quality/r5 >/dev/null 2>&1
git commit -q -m "r5c: 6-command demo grid at the 50k checkpoint" \
  -- quality/r5 >/dev/null 2>&1 || true

note "=== chip session r5c DONE"
