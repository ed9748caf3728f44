"""Batch inference CLI: apply text commands to images.

    python -m dwcgan_tpu.cli.translate --config configs/celeba_faces.yaml \
        --checkpoint outputs/.../checkpoints \
        --list edits.tsv --image_dir ./images --out_dir ./edited

`edits.tsv`: one "image<TAB>command" per line (the same format as the
reference's `valid/FID-IS/src2trg_*.lst`; the same source image may appear
under many commands).  Uses the EMA generator, batches on device, and writes
one output per LINE, named `{line_index:06d}_{basename}` so repeated source
images never overwrite each other (format follows the extension).  This is
the serving surface the reference only exposes implicitly through
`Solver.forward` (solver.py:142-149).
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/celeba_faces.yaml")
    p.add_argument("--checkpoint", required=True,
                   help="Orbax checkpoints root dir, or a single step dir "
                        "(.../checkpoints/8000) — the step is inferred")
    p.add_argument("--step", type=int, default=None,
                   help="checkpoint step to load (default: latest)")
    p.add_argument("--list", required=True, help="TSV: image<TAB>command")
    p.add_argument("--image_dir", required=True)
    p.add_argument("--out_dir", required=True)
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--use_ema", type=int, default=1)
    args = p.parse_args(argv)

    from PIL import Image

    from dwcgan_tpu.config import load_config
    from dwcgan_tpu.data.celeba import _center_crop_resize
    from dwcgan_tpu.eval.harness import read_src2trg
    from dwcgan_tpu.text.vocab import Vocab, encode_commands
    from dwcgan_tpu.train.checkpoint import CheckpointManager
    from dwcgan_tpu.train.sampler import make_infer_fn
    from dwcgan_tpu.train.state import build_models, create_train_state
    from dwcgan_tpu.utils.compile_cache import enable as enable_compile_cache

    enable_compile_cache()
    cfg = load_config(args.config)
    vocab = Vocab(cfg.dataset)
    state = create_train_state(cfg, jax.random.PRNGKey(0), vocab.size)
    # accept either the checkpoints root or a single step directory —
    # the round-4 demo failed silently because the step dir was passed
    # (tools/chip_session_r4.log: "demo translate exit=1")
    ckpt_dir, step = args.checkpoint.rstrip("/"), args.step
    base = os.path.basename(ckpt_dir)
    if base.isdigit():
        ckpt_dir, step = os.path.dirname(ckpt_dir), int(base)
    mgr = CheckpointManager(ckpt_dir)
    assert mgr.latest_step() is not None, f"no checkpoints under {ckpt_dir}"
    step = mgr.latest_step() if step is None else step
    state = mgr.restore(state, step=step)
    mgr.close()
    print(f"loaded checkpoint step {step} from {ckpt_dir}", flush=True)
    params = state.ema_gen_params if args.use_ema else state.gen_params
    gen, _ = build_models(cfg, vocab.size)
    infer = jax.jit(make_infer_fn(cfg, gen))

    pairs = read_src2trg(args.list)
    os.makedirs(args.out_dir, exist_ok=True)
    # pad the tail chunk to a fixed batch so one compiled program serves all
    bs = args.batch_size
    for i in range(0, len(pairs), bs):
        chunk = pairs[i : i + bs]
        imgs = [ _center_crop_resize(
            Image.open(os.path.join(args.image_dir, n)).convert("RGB"),
            cfg.crop_size, cfg.image_size) for n, _ in chunk]
        pad = bs - len(chunk)
        batch_imgs = np.stack(imgs + [imgs[-1]] * pad)
        ids, lens = encode_commands([c for _, c in chunk] + ["do nothing"] * pad,
                                    vocab, cfg.max_text_len)
        out = np.asarray(infer(params, batch_imgs, ids, lens))[: len(chunk)]
        for j, ((name, _), img) in enumerate(zip(chunk, out)):
            u8 = ((np.clip(img, -1, 1) + 1) * 127.5 + 0.5).astype(np.uint8)
            Image.fromarray(u8).save(os.path.join(
                args.out_dir, f"{i + j:06d}_{os.path.basename(name)}"))
        print(f"{min(i + bs, len(pairs))}/{len(pairs)}")
    print(f"wrote {len(pairs)} images to {args.out_dir}")


if __name__ == "__main__":
    main()
