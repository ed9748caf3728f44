"""Roofline accounting for the fused train step (VERDICT r1 weak #3).

Asks XLA's cost model for the compiled step's FLOPs and HBM traffic, then
converts a measured ms/step into sustained TFLOP/s / GB/s and utilization
fractions against TPU v5e peaks.  This answers "is ~100 img/s the conv
roofline for this graph, or is there headroom?" with the compiler's own
numbers instead of hand-waving.

Usage (TPU):
  python tools/roofline.py [--batch 32] [--ms_per_step 313.6] [--vgg 1]
If --ms_per_step is omitted the step is also timed live (median of 10,
device->host fetch sync — see bench.py for why block_until_ready lies here).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# TPU v5e (per chip): bf16 matmul peak and HBM bandwidth
V5E_BF16_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=32)
    p.add_argument("--ms_per_step", type=float, default=None)
    p.add_argument("--vgg", type=int, default=1)
    args = p.parse_args(argv)

    from dwcgan_tpu.utils.compile_cache import enable
    enable()

    import jax
    import numpy as np

    from dwcgan_tpu.config import load_config
    from dwcgan_tpu.data.pipeline import Batch, synthetic_batch
    from dwcgan_tpu.parallel.mesh import create_mesh, place_state, shard_spec
    from dwcgan_tpu.train.state import build_models, create_train_state, make_optimizer
    from dwcgan_tpu.train.step import make_train_step

    cfg = load_config(os.path.join(REPO, "configs", "celeba_faces.yaml"))
    cfg.batch_size = args.batch
    cfg.attr_path = "/nonexistent"
    if not args.vgg:
        cfg.vgg_w = 0.0

    mesh = create_mesh(data=len(jax.devices()), model=1)
    state = create_train_state(cfg, jax.random.PRNGKey(0), vocab_size=102)
    state = place_state(state, mesh, use_tp=False)
    gen, dis = build_models(cfg, 102)
    vgg_loss_fn = None
    if cfg.vgg_w > 0:
        import jax.numpy as jnp
        from dwcgan_tpu.models.vgg import init_random_vgg, make_vgg_loss_fn
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        vgg_loss_fn = make_vgg_loss_fn(init_random_vgg(cfg.seed), dtype=dtype)
    step = make_train_step(cfg, gen, dis, make_optimizer(cfg, state.gen_params),
                           make_optimizer(cfg, state.dis_params),
                           vgg_loss_fn=vgg_loss_fn)

    b = synthetic_batch(args.batch, cfg.image_size, seed=0)
    batch = Batch(*(jax.device_put(np.asarray(x), shard_spec(mesh, x.ndim))
                    for x in b))

    jitted = jax.jit(step, donate_argnums=0)
    compiled = jitted.lower(state, batch).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(ca.get("flops", 0.0))
    bytes_out = float(ca.get("bytes accessed", 0.0))

    ms = args.ms_per_step
    if ms is None:
        st, metrics = jitted(state, batch)
        _ = float(metrics["loss_gen_total"])
        ts = []
        for _i in range(10):
            t0 = time.perf_counter()
            st, metrics = jitted(st, batch)
            _ = float(metrics["loss_gen_total"])
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts)) * 1e3

    tflops_sustained = flops / (ms / 1e3) / 1e12
    gbps_sustained = bytes_out / (ms / 1e3) / 1e9
    print(json.dumps({
        "batch": args.batch,
        "vgg": bool(args.vgg),
        "ms_per_step": round(ms, 2),
        "images_per_sec": round(args.batch / ms * 1e3, 2),
        "xla_flops_per_step": flops,
        "xla_bytes_per_step": bytes_out,
        "sustained_tflops": round(tflops_sustained, 2),
        "mxu_utilization_vs_bf16_peak": round(tflops_sustained / V5E_BF16_TFLOPS, 4),
        "sustained_hbm_gbps": round(gbps_sustained, 2),
        "hbm_utilization": round(gbps_sustained / V5E_HBM_GBPS, 4),
        "arithmetic_intensity_flops_per_byte": round(flops / bytes_out, 2)
        if bytes_out else None,
    }, indent=1))


if __name__ == "__main__":
    main()
