#!/bin/bash
# Round-4 chip session: wait for the axon relay to return, then run the
# measurement queue SERIALLY (1 core + 1 chip — nothing may overlap):
#   1. A/B matrix (tools/ab_round4.sh -> tools/ab_r4.log)
#   2. per-op profiles: train batch 32 vs 64, serving batch 128 vs 256
#      (the VERDICT r3 batch-64 / serving-saturation analyses)
#   3. quality-trend eval of the q3 checkpoints 24k/28k/32k BEFORE the
#      resumed run's ckpt_keep=20 prunes them
#   4. penalty-path evidence runs: n_critic=2, use_r1, gp_w=10 (3k steps
#      each on procedural data)
#   5. resume runs/q3 from its last checkpoint (34000) to 50k steps
#   6. quality-trend eval 36k..50k + the 6-command demo on the 50k ckpt
# Training stages retry through relay wedges: wait-for-TPU, relaunch with
# --resume 1 (lossless Orbax resume), up to 5 attempts each.
set -u
cd "$(dirname "$0")/.."
LOG=tools/chip_session_r4.log
note() { echo "[$(date -u +%H:%M:%SZ)] $*" >> "$LOG"; }

wait_tpu() {
  until timeout 300 python -c "
import jax, jax.numpy as jnp
assert float((jnp.ones((64,64))@jnp.ones((64,64))).sum()) == 64.0*64
" 2>/dev/null; do note "TPU still down"; sleep 120; done
  note "TPU up"
}

# run_train <tag> <timeout_s> <cli args...>: retry through wedges
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

note "=== chip session r4 queue start"
wait_tpu

# 1. A/B matrix
bash tools/ab_round4.sh
note "A/B matrix done (tools/ab_r4.log)"

# 2. profiles: train b32 vs b64, serving b128 vs b256
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

# 3. eval the 24k-32k checkpoints before the 50k run prunes them
wait_tpu
timeout 7200 python -u tools/quality_eval.py \
  --run_dir runs/q3/outputs/celeba_quality --config configs/celeba_quality.yaml \
  --steps 24000,28000,32000 --out runs/q3_quality_mid \
  > runs/q3_quality_mid.log 2>&1
note "q3 mid eval exit=$?"

# 4. penalty-path evidence runs (VERDICT r3 item 3)
for pen in ncritic2 r1 gp; do
  run_train "pen_$pen" 7200 \
    --config "configs/pen_$pen.yaml" --procedural_data \
    --output_path "runs/pen_$pen"
done

# 5. q3 -> 50k (VERDICT r3 item 8); always resumes (ckpts exist to 34000)
for attempt in 1 2 3 4 5; do
  wait_tpu
  note "q3ext attempt $attempt start"
  timeout 14400 python -u -m dwcgan_tpu.cli.train \
    --config configs/celeba_quality.yaml --procedural_data \
    --output_path runs/q3 --resume 1 --max_steps 50000 \
    >> runs/q3_train_ext50k.log 2>&1
  rc=$?
  note "q3ext attempt $attempt exit=$rc"
  [ "$rc" -eq 0 ] && break
  sleep 30
done

# 6. trend rows past 40k + the 6-command demo on the 50k checkpoint
wait_tpu
timeout 10800 python -u tools/quality_eval.py \
  --run_dir runs/q3/outputs/celeba_quality --config configs/celeba_quality.yaml \
  --steps 36000,40000,44000,48000,50000 --out runs/q3_quality_ext50 \
  > runs/q3_quality_ext50.log 2>&1
note "q3 50k eval exit=$?"
wait_tpu
timeout 3600 python -u -m dwcgan_tpu.cli.translate \
  --config configs/celeba_quality.yaml \
  --checkpoint runs/q3/outputs/celeba_quality/checkpoints/50000 \
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

note "=== chip session r4 queue DONE"
