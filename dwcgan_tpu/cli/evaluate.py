"""Evaluation CLI: FID/IS over the reference protocol lists.

    python -m dwcgan_tpu.cli.evaluate --config configs/celeba_faces.yaml \
        --checkpoint outputs/celeba_faces/checkpoints \
        --real_list valid/FID-IS/trg_celeba-1e4.lst \
        --src2trg_list valid/FID-IS/src2trg_celeba-1e4-overall.lst \
        --inception iv3.npz

Replaces the reference's delegation to the external GAN-Metrics repo
(README.md:48-50) with an in-repo pipeline.
"""

from __future__ import annotations

import argparse
import json
import os

import jax
import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/celeba_faces.yaml")
    p.add_argument("--checkpoint", required=True, help="orbax checkpoint dir")
    p.add_argument("--real_list", required=True)
    p.add_argument("--src2trg_list", required=True)
    p.add_argument("--inception", default=None,
                   help=".npz from cli.convert_inception; omit for random "
                        "features (relative comparisons only)")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--limit", type=int, default=None,
                   help="evaluate only the first N list entries")
    p.add_argument("--use_ema", type=int, default=1)
    args = p.parse_args(argv)

    from dwcgan_tpu.config import load_config
    from dwcgan_tpu.data.celeba import _center_crop_resize
    from dwcgan_tpu.eval.harness import (
        compute_fid_is, generate_fakes, read_list, read_src2trg)
    from dwcgan_tpu.eval.inception import init_random_inception
    from dwcgan_tpu.text.vocab import Vocab
    from dwcgan_tpu.train.checkpoint import CheckpointManager
    from dwcgan_tpu.train.sampler import make_infer_fn
    from dwcgan_tpu.train.state import build_models, create_train_state
    from dwcgan_tpu.utils.compile_cache import enable as enable_compile_cache
    from PIL import Image

    enable_compile_cache()
    cfg = load_config(args.config)
    vocab = Vocab(cfg.dataset)

    state = create_train_state(cfg, jax.random.PRNGKey(0), vocab.size)
    mgr = CheckpointManager(args.checkpoint)
    state = mgr.restore(state)
    mgr.close()
    params = state.ema_gen_params if args.use_ema else state.gen_params
    gen, _ = build_models(cfg, vocab.size)
    infer_fn = jax.jit(make_infer_fn(cfg, gen))

    if args.inception:
        from dwcgan_tpu.cli.convert_inception import load_converted
        iv3 = load_converted(args.inception)
    else:
        print("WARNING: no inception weights; FID uses a random-init "
              "extractor (valid only for relative comparisons)")
        iv3 = init_random_inception()

    reals = read_list(args.real_list)[: args.limit]
    pairs = read_src2trg(args.src2trg_list)[: args.limit]

    def real_batches():
        for i in range(0, len(reals), args.batch_size):
            imgs = []
            for name in reals[i : i + args.batch_size]:
                img = Image.open(os.path.join(cfg.data_root, name)).convert("RGB")
                imgs.append(_center_crop_resize(img, cfg.crop_size, cfg.image_size))
            yield np.stack(imgs)

    fakes = generate_fakes(infer_fn, params, cfg.data_root, pairs, vocab,
                           cfg.image_size, cfg.crop_size, args.batch_size,
                           cfg.max_text_len)
    results = compute_fid_is(real_batches(), fakes, iv3)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
