"""Measure the REFERENCE implementation's training throughput on this host.

Round-1 `bench.py` divided by a hardcoded *estimate* of the reference's
speed (flagged in VERDICT.md "What's weak" #2).  This tool replaces the
estimate with a measurement: it imports the reference (read-only, from
/root/reference — executed, never copied), builds its `Solver` on CPU with
the flagship CelebA config, and times full `dis_update` + `gen_update`
iterations on random batches.  Optionally it times OUR fused step on the
same CPU for a same-hardware framework-vs-framework ratio.

The reference is CUDA-only in spirit but runs fine on CPU (PyTorch CPU
kernels); no GPU exists in this environment, and the reference repo
publishes no speed numbers of its own (SURVEY §6), so a measured CPU anchor
plus a measured same-host ratio is the most honest denominator available.

Usage:
  python tools/bench_reference.py                 # reference torch-CPU
  python tools/bench_reference.py --ours          # our framework, JAX-CPU
  python tools/bench_reference.py --batch 8 --steps 5

Writes/updates tools/baseline_measured.json with the results.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
OUT_PATH = os.path.join(REPO, "tools", "baseline_measured.json")


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--steps", type=int, default=6)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--ours", action="store_true",
                   help="time OUR fused step on CPU instead of the reference")
    p.add_argument("--vgg", action="store_true",
                   help="include the perceptual term (reference would need "
                        "downloaded weights; off by default on both sides)")
    return p.parse_args(argv)


def _random_batch_np(batch, image_size=128, num_cls=8, mx_len=80, seed=0):
    import numpy as np
    rng = np.random.default_rng(seed)
    x = rng.uniform(-1, 1, (batch, 3, image_size, image_size)).astype("float32")
    src = (rng.integers(0, 2, (batch, num_cls))).astype("float32")
    trg = (rng.integers(0, 2, (batch, num_cls))).astype("float32")
    lens = rng.integers(6, 20, (batch,)).astype("int64")
    txt = np.ones((batch, mx_len + 2), dtype="int64")  # PAD=1 in ref vocab
    for i in range(batch):
        txt[i, 0] = 0                                   # BOS
        txt[i, 1:lens[i] - 1] = rng.integers(4, 100, (lens[i] - 2,))
        txt[i, lens[i] - 1] = 2                         # EOS
    return x, src, trg, txt, lens


def _shim_missing_modules():
    """The environment has torch but not torchvision/torchfile; the reference
    imports both at module scope (utils.py:23-29) though the benched path
    (vgg_w=0) never calls into them.  Register minimal stand-ins."""
    import types
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv.transforms = types.ModuleType("torchvision.transforms")
        tv.utils = types.ModuleType("torchvision.utils")
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tv.transforms
        sys.modules["torchvision.utils"] = tv.utils
    if "torchfile" not in sys.modules:
        tf = types.ModuleType("torchfile")
        tf.load = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("torchfile shim: load_lua unavailable"))
        sys.modules["torchfile"] = tf


def bench_reference(args):
    sys.path.insert(0, REFERENCE)
    _shim_missing_modules()
    import numpy as np
    import torch
    import yaml

    with open(os.path.join(REFERENCE, "configs", "celeba_faces.yaml")) as f:
        config = yaml.safe_load(f)
    config["batch_size"] = args.batch
    if not args.vgg:
        config["vgg_w"] = 0
    config["gpu_ids"] = []

    torch.manual_seed(1234)
    device = torch.device("cpu")
    from solver import Solver
    from tools import asign_label

    trainer = Solver(config, device, None).to(device)
    trainer.train()

    x, src, trg, txt, lens = _random_batch_np(args.batch, config["image_size"],
                                              config["gen"]["num_cls"])
    x_real = torch.from_numpy(x)
    label_src = torch.from_numpy(src)
    label_trg = torch.from_numpy(trg)
    c_src = asign_label(label_src, config["c_dim"], config["dataset"]).to(device)
    c_trg = asign_label(label_trg, config["c_dim"], config["dataset"]).to(device)
    txt_t = torch.from_numpy(txt)
    lens_t = torch.from_numpy(lens)

    def one_iter(it):
        trainer.dis_update(x_real, c_src, c_trg, txt_t, lens_t,
                           label_src, label_trg, config, it)
        trainer.gen_update(x_real, c_src, c_trg, txt_t, lens_t,
                           label_src, label_trg, config, it)

    for i in range(args.warmup):
        one_iter(i)
    times = []
    for i in range(args.steps):
        t0 = time.perf_counter()
        one_iter(args.warmup + i)
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return {
        "impl": "reference-torch",
        "device": "cpu",
        "torch_threads": torch.get_num_threads(),
        "batch": args.batch,
        "sec_per_iter": round(dt, 3),
        "images_per_sec": round(args.batch / dt, 3),
        "vgg": bool(args.vgg),
    }


def bench_ours_cpu(args):
    # force the CPU backend before jax initializes (axon sitecustomize note
    # in tests/conftest.py)
    os.environ["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, REPO)
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from dwcgan_tpu.config import load_config
    from dwcgan_tpu.data.pipeline import Batch
    from dwcgan_tpu.parallel.mesh import create_mesh, place_state, shard_spec
    from dwcgan_tpu.train.state import build_models, create_train_state, make_optimizer
    from dwcgan_tpu.train.step import make_train_step

    cfg = load_config(os.path.join(REPO, "configs", "celeba_faces.yaml"))
    cfg.batch_size = args.batch
    cfg.compute_dtype = "float32"  # bf16 is emulated (slow) on CPU
    if not args.vgg:
        cfg.vgg_w = 0.0

    mesh = create_mesh(data=1, model=1)
    state = create_train_state(cfg, jax.random.PRNGKey(0), vocab_size=102)
    state = place_state(state, mesh, use_tp=False)
    gen, dis = build_models(cfg, 102)
    gen_tx = make_optimizer(cfg, state.gen_params)
    dis_tx = make_optimizer(cfg, state.dis_params)
    step_fn = jax.jit(make_train_step(cfg, gen, dis, gen_tx, dis_tx),
                      donate_argnums=0)

    x, src, trg, txt, lens = _random_batch_np(args.batch, cfg.image_size)
    b = Batch(image=np.transpose(x, (0, 2, 3, 1)),
              src_label=src, trg_label=trg,
              txt=txt.astype("int32"), txt_len=lens.astype("int32"))
    batch = Batch(*(jax.device_put(np.asarray(v), shard_spec(mesh, np.asarray(v).ndim))
                    for v in b))

    for _ in range(1 + args.warmup):
        state, metrics = step_fn(state, batch)
    _ = float(metrics["loss_gen_total"])
    times = []
    for _ in range(args.steps):
        t0 = time.perf_counter()
        state, metrics = step_fn(state, batch)
        _ = float(metrics["loss_gen_total"])  # host fetch: honest sync
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    return {
        "impl": "dwcgan_tpu-jax",
        "device": "cpu",
        "batch": args.batch,
        "sec_per_iter": round(dt, 3),
        "images_per_sec": round(args.batch / dt, 3),
        "vgg": bool(args.vgg),
    }


def main(argv=None):
    args = parse_args(argv)
    row = bench_ours_cpu(args) if args.ours else bench_reference(args)
    print(json.dumps(row))
    data = {}
    if os.path.exists(OUT_PATH):
        with open(OUT_PATH) as f:
            data = json.load(f)
    data[f"{row['impl']}_b{row['batch']}" + ("_vgg" if row["vgg"] else "")] = row
    with open(OUT_PATH, "w") as f:
        json.dump(data, f, indent=1)
    print(f"updated {OUT_PATH}")


if __name__ == "__main__":
    main()
