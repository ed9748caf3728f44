#!/bin/bash
# Round-5 chip session, part D: replica of the r5c 50k run.
#
# r5c trained the shipped 1pass config 20k -> 50k and FINISHED (loss trail
# recovered in quality/r5/r5c_loss_trail_recovered.txt), but a VM reset at
# ~17:50Z wiped runs/ before stage 2 (long-horizon trend eval) and stage 3
# (50k demo) could read the checkpoints.  This session replays the full run
# 0 -> 50k under configs/celeba_quality_r5d.yaml — mathematically identical
# (seed 1234, deterministic procedural data), save cadence relaxed to
# 10000 so the replay fits the remaining round budget — then evals the
# 30k/40k/50k checkpoints and regenerates the 50k demo grid.
#
# Hard deadline discipline: stage 1 is bounded so the chip is FREE well
# before the round's bench run; stages 2-3 use whatever checkpoints exist.
set -u
cd "$(dirname "$0")/.."
LOG=tools/chip_session_r5d.log
note() { echo "[$(date -u +%H:%M:%SZ)] r5d: $*" >> "$LOG"; }

wait_tpu() {
  until timeout 300 python -c "
import jax, jax.numpy as jnp
assert float((jnp.ones((64,64))@jnp.ones((64,64))).sum()) == 64.0**3
" 2>/dev/null; do note "TPU still down"; sleep 60; done
  note "TPU up"
}

mkdir -p runs quality/r5
note "=== chip session r5d start (replica of wiped r5c)"

snapshot() {
  tail -n 30 runs/q5d_train.log > quality/r5/train_tail_r5d.log 2>/dev/null
  git add quality/r5 >/dev/null 2>&1
  git commit -q -m "r5d replica-run progress snapshot (auto)" -- quality/r5 >/dev/null 2>&1 || true
}

( while true; do sleep 600; snapshot; done ) &
WATCH=$!
echo "$WATCH" > /tmp/r5d_watch.pid

# Absolute session deadline: everything (train/eval/demo) must release the
# chip by ABS_END so the round's bench run is uncontended.
ABS_END=$(( $(date +%s) + 9600 ))

# ---- stage 1: train 0 -> 50000 (replica; resume-capable across attempts)
# Total stage budget ~130 min; per-attempt timeout leaves the tail attempts
# only the remainder so the stage cannot overrun the deadline.
STAGE1_END=$(( $(date +%s) + 7800 ))
for attempt in 1 2 3 4; do
  left=$(( STAGE1_END - $(date +%s) ))
  [ "$left" -le 120 ] && { note "stage-1 deadline reached before attempt $attempt"; break; }
  wait_tpu
  note "replica attempt $attempt start (budget ${left}s)"
  timeout "$left" python -u -m dwcgan_tpu.cli.train \
    --config configs/celeba_quality_r5d.yaml --procedural_data \
    --output_path runs/q5d --resume 1 --max_steps 50000 \
    >> runs/q5d_train.log 2>&1
  rc=$?
  note "replica attempt $attempt exit=$rc"
  [ "$rc" -eq 0 ] && break
  sleep 15
done
kill "$WATCH" 2>/dev/null
snapshot
git commit -q -m "r5d: replica run trained (stage 1 done)" -- quality/r5 >/dev/null 2>&1 || true

CKPT_DIR=runs/q5d/outputs/celeba_quality_r5d/checkpoints

# ---- stage 2: trend eval over whichever long-horizon checkpoints exist,
# trimmed to the time actually left before ABS_END (~10 min first step incl.
# compile, ~5 min each warm step, 10 min reserved for the stage-3 demo).
EVAL_BUDGET=$(( ABS_END - $(date +%s) - 700 ))
steps=$(EVAL_BUDGET="$EVAL_BUDGET" python - <<'PYEOF'
import os
d = "runs/q5d/outputs/celeba_quality_r5d/checkpoints"
avail = sorted(int(s) for s in os.listdir(d) if s.isdigit()) if os.path.isdir(d) else []
# long-horizon rows only (trend already has 10k-20k from the r4-config run)
longh = [s for s in avail if s > 20000]
budget = int(os.environ["EVAL_BUDGET"])
n_afford = max(0, 1 + (budget - 600) // 300) if budget > 600 else 0
print(",".join(str(s) for s in longh[-n_afford:]) if n_afford else "")
PYEOF
)
note "long-horizon eval steps chosen: ${steps:-none} (budget ${EVAL_BUDGET}s)"
if [ -n "$steps" ]; then
  wait_tpu
  timeout "$EVAL_BUDGET" python -u tools/quality_eval.py \
    --run_dir runs/q5d/outputs/celeba_quality_r5d \
    --config configs/celeba_quality_r5d.yaml \
    --steps "$steps" \
    --out runs/q5d_quality > runs/q5d_quality.log 2>&1
  note "replica eval exit=$?"
  python - >> "$LOG" 2>&1 <<'PYEOF'
import json
a = json.load(open("quality/r5/quality_trend_r5_postgate.json"))
b = json.load(open("runs/q5d_quality/quality_trend.json"))
seen = {r["step"] for r in a["results"]}
new = [dict(r, run="r5d-replica") for r in b["results"] if r["step"] not in seen]
a["results"] += new
a["results"].sort(key=lambda r: r["step"])
a.setdefault("notes", []).append(
    "rows tagged run=r5d-replica come from the r5d replica of the wiped r5c run: "
    "identical math/seed (configs/celeba_quality_r5d.yaml), save cadence 10000")
with open("quality/r5/quality_trend_r5_postgate.json", "w") as f:
    json.dump(a, f, indent=1)
    f.write("\n")
print("merged trend steps:", [r["step"] for r in a["results"]])
PYEOF
  python - > quality/r5/trend_50k.txt 2>&1 <<'PYEOF'
import json
rows = json.load(open("quality/r5/quality_trend_r5_postgate.json"))["results"]
print("50k-horizon trend, shipped 1pass config (r5d replica of the wiped r5c run)")
print("r3's trend stops at 20000; rows past that are absolute (stability, not comparison)")
print("step  | fid_rel | attr_acc | recon_l1 | source")
for r in rows:
    if r["step"] < 10000:
        continue
    src = r.get("run", "r5b/r5c run")
    print(f"{r['step']:5d} | {r['fid_rel']:7.3f} | {r['attr_transfer_acc']:.4f} | "
          f"{r['nochange_recon_l1']:.4f} | {src}")
PYEOF
  cp -f runs/q5d_quality/grid_00050000.jpg quality/r5/ 2>/dev/null
  git add quality/r5 >/dev/null 2>&1
  git commit -q -m "r5d: long-horizon trend rows (replica run) merged into the r5 trend" \
    -- quality/r5 >/dev/null 2>&1 || true
fi

# ---- stage 3: demo grid at the last checkpoint
last=$(python - <<'PYEOF'
import os
d = "runs/q5d/outputs/celeba_quality_r5d/checkpoints"
avail = sorted(int(s) for s in os.listdir(d) if s.isdigit()) if os.path.isdir(d) else []
print(avail[-1] if avail else "")
PYEOF
)
DEMO_BUDGET=$(( ABS_END - $(date +%s) ))
if [ -n "$last" ] && [ "$last" -gt 20000 ] && [ "$DEMO_BUDGET" -gt 180 ]; then
  outdir=$(mktemp -d)
  for try in 1 2; do
    wait_tpu
    timeout "$DEMO_BUDGET" python -u -m dwcgan_tpu.cli.translate \
      --config configs/celeba_quality_r5d.yaml \
      --checkpoint "$CKPT_DIR" --step "$last" \
      --list tools/demo_faces/cmds.lst --image_dir tools/demo_faces \
      --out_dir "$outdir" >> "$LOG" 2>&1
    note "demo step=$last try=$try exit=$?"
    [ "$(ls "$outdir" 2>/dev/null | wc -l)" -ge 6 ] && break
    sleep 10
  done
  python - "$outdir" "quality/r5/demo_commands_r5_${last}.jpg" >> "$LOG" 2>&1 <<'PYEOF'
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
  if [ ! -f "quality/r5/demo_commands_r5_${last}.jpg" ]; then
    note "FATAL: demo grid quality/r5/demo_commands_r5_${last}.jpg missing"
  fi
  git add quality/r5 >/dev/null 2>&1
  git commit -q -m "r5d: 6-command demo grid at the ${last} checkpoint (replica run)" \
    -- quality/r5 >/dev/null 2>&1 || true
else
  note "no checkpoint past 20k; demo skipped"
fi

git add "$LOG" >/dev/null 2>&1
git commit -q -m "Commit r5d chip session log" -- "$LOG" >/dev/null 2>&1 || true
note "=== chip session r5d DONE"
