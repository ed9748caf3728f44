#!/bin/bash
# Round-5 chip session, part B: extend the post-gate evidence.
#
# The 12k/14k rows of quality/r5/trend_vs_r3_postgate.txt read worse than
# r3's same-step 2pass rows (fid_rel 1.754 vs 1.197 @12k, 2.007 vs 1.522
# @14k); ROUND5.md calls them n=1 GAN-noise excursions.  r3's trend has
# rows at 16000/18000/20000, so extending the same run 14k -> 20k buys
# three more same-step comparisons under the SHIPPED 1pass config —
# either the excursion washes out (supporting the noise claim) or it
# persists (and the default flip gets re-examined honestly).
#
# Stage 1: resume runs/q4 (configs/celeba_quality_r4.yaml) 14000 -> 20000.
# Stage 2: trend eval at 16000/18000/20000; regenerate the full post-gate
#          table (10k..20k) vs r3.
# Stage 3: 6-command demo grid at the 20000 checkpoint.
set -u
cd "$(dirname "$0")/.."
LOG=tools/chip_session_r5b.log
note() { echo "[$(date -u +%H:%M:%SZ)] r5b: $*" >> "$LOG"; }

wait_tpu() {
  until timeout 300 python -c "
import jax, jax.numpy as jnp
assert float((jnp.ones((64,64))@jnp.ones((64,64))).sum()) == 64.0**3
" 2>/dev/null; do note "TPU still down"; sleep 60; done
  note "TPU up"
}

mkdir -p runs quality/r5
note "=== chip session r5b start"

snapshot() {
  cp -f runs/q4/outputs/celeba_quality_r4/images/test_000?[02468]000.jpg quality/r5/ 2>/dev/null
  cp -f runs/q4/outputs/celeba_quality_r4/images/test_00020000.jpg quality/r5/ 2>/dev/null
  tail -n 30 runs/q5_train.log > quality/r5/train_tail.log 2>/dev/null
  git add quality/r5 >/dev/null 2>&1
  git commit -q -m "r5b 20k-run progress snapshot (auto)" -- quality/r5 >/dev/null 2>&1 || true
}

( while true; do sleep 300; snapshot; done ) &
WATCH=$!
echo "$WATCH" > /tmp/r5b_watch.pid

# ---- stage 1: resume 14000 -> 20000 under the shipped 1pass config
for attempt in 1 2 3 4; do
  wait_tpu
  note "q20k attempt $attempt start"
  timeout 5400 python -u -m dwcgan_tpu.cli.train \
    --config configs/celeba_quality_r4.yaml --procedural_data \
    --output_path runs/q4 --resume 1 --max_steps 20000 \
    >> runs/q5_train.log 2>&1
  rc=$?
  note "q20k attempt $attempt exit=$rc"
  [ "$rc" -eq 0 ] && break
  sleep 20
done
kill "$WATCH" 2>/dev/null
snapshot
git commit -q -m "r5b: 1pass config trained to 20k" -- quality/r5 >/dev/null 2>&1 || true

# ---- stage 2: trend eval at 16k/18k/20k, merged post-gate table
wait_tpu
timeout 7200 python -u tools/quality_eval.py \
  --run_dir runs/q4/outputs/celeba_quality_r4 \
  --config configs/celeba_quality_r4.yaml \
  --steps 16000,18000,20000 \
  --out runs/q5b_quality > runs/q5b_quality.log 2>&1
note "q20k eval exit=$?"
python - >> "$LOG" 2>&1 <<'PYEOF'
import json
a = json.load(open("quality/r5/quality_trend_r5_postgate.json"))
b = json.load(open("runs/q5b_quality/quality_trend.json"))
seen = {r["step"] for r in a["results"]}
a["results"] += [r for r in b["results"] if r["step"] not in seen]
a["results"].sort(key=lambda r: r["step"])
with open("quality/r5/quality_trend_r5_postgate.json", "w") as f:
    json.dump(a, f, indent=1)
    f.write("\n")
print("merged trend steps:", [r["step"] for r in a["results"]])
PYEOF
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
git commit -q -m "r5b: post-gate trend extended to 20k vs r3 same-step rows" \
  -- quality/r5 >/dev/null 2>&1 || true

# ---- stage 3: demo grid at 20000
outdir=$(mktemp -d)
for try in 1 2; do
  wait_tpu
  timeout 3600 python -u -m dwcgan_tpu.cli.translate \
    --config configs/celeba_quality_r4.yaml \
    --checkpoint runs/q4/outputs/celeba_quality_r4/checkpoints --step 20000 \
    --list tools/demo_faces/cmds.lst --image_dir tools/demo_faces \
    --out_dir "$outdir" >> "$LOG" 2>&1
  note "demo step=20000 try=$try exit=$?"
  [ "$(ls "$outdir" 2>/dev/null | wc -l)" -ge 6 ] && break
  sleep 10
done
python - "$outdir" quality/r5/demo_commands_r5_20k.jpg >> "$LOG" 2>&1 <<'PYEOF'
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
if [ ! -f quality/r5/demo_commands_r5_20k.jpg ]; then
  note "FATAL: demo grid quality/r5/demo_commands_r5_20k.jpg missing"
fi
git add quality/r5 >/dev/null 2>&1
git commit -q -m "r5b: 6-command demo grid at the 20k checkpoint" \
  -- quality/r5 >/dev/null 2>&1 || true

note "=== chip session r5b DONE"
