"""Analytic whole-step FLOPs of the bench graph, relay-independent.

`bench.py` derives MFU from the COMPILED executable's cost analysis (the
optimized HLO — what actually executes, post-fusion/CSE).  This tool lowers
the same step on the CPU backend WITHOUT compiling and reads the
pre-optimization cost analysis: a cross-check of the MFU numerator that
works while the accelerator relay is down, and a round-over-round record of
the model's FLOP count per train step.

The pre-optimization count is an upper bound of the executed count (CSE and
algebraic simplification only remove work); bench.py's compiled count is the
authoritative MFU numerator.

Usage: python tools/flops_report.py [--batch 32] [--vgg 1]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--vgg", type=int, default=1)
    p.add_argument("--norm_stats", default="2pass")
    p.add_argument("--parity", default=None,
                   help="override cfg.parity_convs (off/stems/head/all)")
    args = p.parse_args(argv)

    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from dwcgan_tpu.config import load_config
    from dwcgan_tpu.data.pipeline import Batch, synthetic_batch
    from dwcgan_tpu.parallel.mesh import create_mesh, place_state, shard_spec
    from dwcgan_tpu.train.state import (build_models, create_train_state,
                                        make_optimizer)
    from dwcgan_tpu.train.step import make_train_step

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(root, "configs", "celeba_faces.yaml"))
    cfg.batch_size = args.batch
    cfg.attr_path = "/nonexistent"
    cfg.norm_stats = args.norm_stats
    if not args.vgg:
        cfg.vgg_w = 0.0
    if args.parity is not None:
        cfg.parity_convs = {"off": False, "all": True}.get(args.parity,
                                                           args.parity)

    mesh = create_mesh(data=1, model=1)
    state = create_train_state(cfg, jax.random.PRNGKey(0), vocab_size=102)
    state = place_state(state, mesh, use_tp=False)
    gen, dis = build_models(cfg, 102)
    gen_tx = make_optimizer(cfg, state.gen_params)
    dis_tx = make_optimizer(cfg, state.dis_params)
    vgg_loss_fn = None
    if cfg.vgg_w > 0:
        import jax.numpy as jnp
        from dwcgan_tpu.models.vgg import init_random_vgg, make_vgg_loss_fn
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        vgg_loss_fn = make_vgg_loss_fn(init_random_vgg(cfg.seed), dtype=dtype)
    step_fn = jax.jit(make_train_step(cfg, gen, dis, gen_tx, dis_tx,
                                      vgg_loss_fn=vgg_loss_fn),
                      donate_argnums=0)

    b = synthetic_batch(args.batch, cfg.image_size, seed=0)
    batch = Batch(*(jax.device_put(np.asarray(x), shard_spec(mesh, x.ndim))
                    for x in b))
    lowered = step_fn.lower(state, batch)
    ca = lowered.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    out = {
        "batch": args.batch,
        "vgg": bool(args.vgg),
        "norm_stats": args.norm_stats,
        "parity_convs": str(cfg.parity_convs),
        "pre_opt_flops_per_step": flops,
        "pre_opt_tflops_per_step": round(flops / 1e12, 3),
        "tflops_per_image": round(flops / args.batch / 1e12, 4),
        "bytes_accessed": float(ca.get("bytes accessed", 0.0)),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
