"""Quality evidence over a training run's checkpoint trail.

For every Orbax checkpoint in a run directory, generates text-guided
translations of a held-out procedural test set with the EMA generator and
reports:

- FID (fakes vs. procedural real renders) using the in-repo InceptionV3 with
  fixed random weights — a valid *relative* metric (eval/inception.py note);
  the same seed is used for every checkpoint so the trend is comparable.
- Attribute-transfer accuracy: the analytic probe (data/procedural.py)
  reads the 8 attribute bits off each generated image and scores them
  against the commanded target label — objective evidence that the text
  command actually changed the requested attributes.
- Reconstruction L1 (no-change command path sanity).
- A sample grid per checkpoint (real / translated rows).

Usage:
  python tools/quality_eval.py --run_dir <outputs/celeba_quality> \
      --config configs/celeba_quality.yaml --n_eval 1024 --out quality_artifacts
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--run_dir", required=True,
                   help="run output dir containing checkpoints/")
    p.add_argument("--config", default="configs/celeba_quality.yaml")
    p.add_argument("--n_eval", type=int, default=1024)
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--out", default="quality_artifacts")
    p.add_argument("--steps", type=str, default="",
                   help="comma-separated checkpoint steps (default: all)")
    return p.parse_args(argv)


def main(argv=None):
    from dwcgan_tpu.utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache()

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from dwcgan_tpu.config import load_config
    from dwcgan_tpu.data.procedural import (
        ProceduralFaceDataset, attribute_accuracy)
    from dwcgan_tpu.eval.harness import compute_fid_is
    from dwcgan_tpu.eval.inception import init_random_inception
    from dwcgan_tpu.text.vocab import tokens_to_ids
    from dwcgan_tpu.train.sampler import make_infer_fn
    from dwcgan_tpu.train.state import build_models, create_train_state
    from dwcgan_tpu.utils.images import save_image_grid

    args = parse_args(argv)
    cfg = load_config(args.config)
    os.makedirs(args.out, exist_ok=True)

    # ---- held-out test set: same construction as cli.train --procedural_data
    ds = ProceduralFaceDataset(n_samples=max(args.n_eval, 512),
                               image_size=cfg.image_size, seed=cfg.seed + 777,
                               mode="test", max_text_len=cfg.max_text_len)
    n = min(args.n_eval, len(ds))
    rng = np.random.default_rng(123)
    perm = rng.permutation(len(ds))[:n]

    print(f"rendering {n} real/test images + commands ...", flush=True)
    reals, srcs, trgs, cmds = [], [], [], []
    for i in range(n):
        reals.append(ds.render(i))
        srcs.append(ds.labels[i])
        trg = ds.labels[perm[i]]
        trgs.append(trg)
        cmds.append(ds.synth.labels2text(ds.labels[i], trg).split())
    reals = np.stack(reals)
    trgs = np.stack(trgs)
    txt, lens = tokens_to_ids(cmds, ds.vocab, max_len=cfg.max_text_len)

    # no-change commands for the reconstruction probe
    txt_id, lens_id = tokens_to_ids(
        [ds.synth.labels2text(s, s).split() for s in srcs[:args.batch]],
        ds.vocab, max_len=cfg.max_text_len)

    # ---- model + checkpoints
    template = create_train_state(cfg, jax.random.PRNGKey(cfg.seed),
                                  vocab_size=ds.vocab.size)
    gen, _ = build_models(cfg, ds.vocab.size)
    infer = jax.jit(make_infer_fn(cfg, gen))

    ckpt_dir = os.path.abspath(os.path.join(args.run_dir, "checkpoints"))
    mgr = ocp.CheckpointManager(ckpt_dir)
    all_steps = sorted(mgr.all_steps())
    if args.steps:
        want = {int(s) for s in args.steps.split(",")}
        all_steps = [s for s in all_steps if s in want]
    assert all_steps, f"no checkpoints under {ckpt_dir}"
    print(f"checkpoints: {all_steps}", flush=True)

    inc_vars = init_random_inception(seed=0)
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)

    def batches(arr_list):
        for i in range(0, n, args.batch):
            yield tuple(a[i:i + args.batch] for a in arr_list)

    results = []
    for step in all_steps:
        state = mgr.restore(step, args=ocp.args.StandardRestore(abstract))
        params = state.ema_gen_params

        fakes = []
        for (xb, tb, lb) in batches((reals, txt, lens)):
            out = infer(params, jnp.asarray(xb), jnp.asarray(tb), jnp.asarray(lb))
            fakes.append(np.asarray(out, np.float32))
        fakes = np.concatenate(fakes)

        acc = attribute_accuracy(fakes, trgs)
        fid = compute_fid_is(
            (reals[i:i + args.batch] for i in range(0, n, args.batch)),
            (fakes[i:i + args.batch] for i in range(0, n, args.batch)),
            inc_vars)

        rec = np.asarray(infer(params, jnp.asarray(reals[:args.batch]),
                               jnp.asarray(txt_id), jnp.asarray(lens_id)),
                         np.float32)
        rec_l1 = float(np.abs(rec - reals[:args.batch]).mean())

        save_image_grid([reals[:8], fakes[:8]], 8,
                        os.path.join(args.out, f"grid_{step:08d}.jpg"))
        row = {
            "step": int(step),
            "fid_rel": round(float(fid["fid"]), 3),
            "is_mean": round(float(fid["is_mean"]), 3),
            "attr_transfer_acc": round(float(acc.mean()), 4),
            "attr_acc_per_bit": [round(float(a), 3) for a in acc],
            "nochange_recon_l1": round(rec_l1, 4),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    mgr.close()
    # self-describing provenance (ADVICE r4): which config produced the trend
    import hashlib
    with open(args.config, "rb") as f:
        cfg_sha = hashlib.sha256(f.read()).hexdigest()[:16]
    with open(os.path.join(args.out, "quality_trend.json"), "w") as f:
        json.dump({"n_eval": n, "inception": "random-weights seed 0",
                   "config": os.path.relpath(args.config),
                   "config_sha256_16": cfg_sha,
                   "run_dir": os.path.relpath(args.run_dir),
                   "norm_stats": cfg.norm_stats, "seed": cfg.seed,
                   "results": results}, f, indent=1)
        f.write("\n")
    print(f"wrote {args.out}/quality_trend.json", flush=True)


if __name__ == "__main__":
    main()
