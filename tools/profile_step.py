"""Per-op TPU time breakdown of the fused train step.

Captures a `jax.profiler` trace of a few bench-identical steps (same setup
as bench.py: flagship CelebA 128px config, synthetic batch, bf16) and
parses the chrome-trace output into a per-op device-time table — the
accounting VERDICT r2 asked for ("publish a per-op TPU profile"), as
opposed to the aggregate XLA cost model in tools/roofline.py.

Usage:
    python tools/profile_step.py [--steps 5] [--out tools/profile_results.json]

Prints the top ops by total device time, groups them into coarse buckets
(conv, matmul/LSTM, norm/elementwise fusions, copies/transposes, ...), and
writes the full table to JSON for PERF.md.
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(trace_dir: str, steps: int, batch_size: int,
            mode: str = "train") -> float:
    """Run bench-identical steps under the profiler; returns median step s."""
    import jax
    import numpy as np

    from dwcgan_tpu.utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache()

    from dwcgan_tpu.config import load_config
    from dwcgan_tpu.data.pipeline import Batch, synthetic_batch
    from dwcgan_tpu.parallel.mesh import create_mesh, place_state, shard_spec
    from dwcgan_tpu.train.state import (
        build_models, create_train_state, make_optimizer)
    from dwcgan_tpu.train.step import make_train_step

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = load_config(os.path.join(root, "configs", "celeba_faces.yaml"))
    cfg.batch_size = batch_size
    cfg.attr_path = "/nonexistent"
    # same A/B env knobs as bench.py so profiles describe the benched graph
    if os.environ.get("BENCH_PARITY") is not None:
        v = os.environ["BENCH_PARITY"]
        cfg.parity_convs = {"0": False, "1": True}.get(v, v)
    if os.environ.get("BENCH_NORM_STATS"):
        cfg.norm_stats = os.environ["BENCH_NORM_STATS"]
    if os.environ.get("BENCH_VGG") == "0":
        cfg.vgg_w = 0.0

    n_dev = len(jax.devices())
    if mode == "infer":
        return _capture_infer(trace_dir, steps, batch_size, cfg, n_dev)
    mesh = create_mesh(data=n_dev, model=1)
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

    b = synthetic_batch(batch_size, cfg.image_size, seed=0)
    batch = Batch(*(jax.device_put(np.asarray(x), shard_spec(mesh, x.ndim))
                    for x in b))
    for _ in range(3):  # compile + steady
        state, metrics = step_fn(state, batch)
    _ = float(metrics["loss_gen_total"])

    times = []
    jax.profiler.start_trace(trace_dir)
    for _ in range(steps):
        t0 = time.perf_counter()
        state, metrics = step_fn(state, batch)
        _ = float(metrics["loss_gen_total"])  # host fetch: honest sync
        times.append(time.perf_counter() - t0)
    jax.profiler.stop_trace()
    return float(np.median(times))


def _capture_infer(trace_dir, steps, batch_size, cfg, n_dev):
    """Profile the serving forward (bench.py BENCH_MODE=infer graph) — for
    the serving-saturation analysis (VERDICT r3 weak #1)."""
    import time

    import jax
    import numpy as np

    from dwcgan_tpu.data.pipeline import Batch, synthetic_batch
    from dwcgan_tpu.parallel.mesh import create_mesh, shard_spec
    from dwcgan_tpu.train.sampler import make_infer_fn
    from dwcgan_tpu.train.state import build_models, create_train_state

    mesh = create_mesh(data=n_dev, model=1)
    state = create_train_state(cfg, jax.random.PRNGKey(0), vocab_size=102)
    gen, _ = build_models(cfg, 102)
    infer = jax.jit(make_infer_fn(cfg, gen))
    b = synthetic_batch(batch_size, cfg.image_size, seed=0)
    batch = Batch(*(jax.device_put(np.asarray(x), shard_spec(mesh, x.ndim))
                    for x in b))
    out = infer(state.gen_params, batch.image, batch.txt, batch.txt_len)
    _ = np.asarray(out[0, 0, 0, 0])

    times = []
    jax.profiler.start_trace(trace_dir)
    for _ in range(steps):
        t0 = time.perf_counter()
        out = infer(state.gen_params, batch.image, batch.txt, batch.txt_len)
        _ = np.asarray(out[0, 0, 0, 0])
        times.append(time.perf_counter() - t0)
    jax.profiler.stop_trace()
    return float(np.median(times))


def parse_trace(trace_dir: str):
    """Aggregate device-side op durations from the chrome trace.

    Buckets use the profiler's own `hlo_category` (names like `fusion.387`
    are frequently *convolution* fusions — bucketing by name mislabels
    them); `model_flops`/`bytes_accessed` give per-op achieved FLOP/s and
    bandwidth."""
    paths = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    assert paths, f"no trace.json.gz under {trace_dir}"
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])

    # map (pid, tid) -> names so we keep only device-side "XLA Ops" threads
    proc_names, thread_names = {}, {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e["pid"]] = e["args"].get("name", "")
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            thread_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    device_pids = {pid for pid, n in proc_names.items()
                   if "TPU" in n or "/device" in n.lower()}
    ops = {}   # name -> {us, count, category, flops, bytes}
    total = 0.0
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in device_pids:
            continue
        tname = thread_names.get((e["pid"], e.get("tid")), "")
        if "step" in tname.lower() or "module" in tname.lower():
            continue  # keep op-level rows only
        name = e.get("name", "?")
        args = e.get("args", {})
        dur = float(e.get("dur", 0.0))  # microseconds
        rec = ops.setdefault(name, {
            "us": 0.0, "count": 0,
            "category": args.get("hlo_category", "?"),
            "flops": float(args.get("model_flops", 0) or 0),
            "bytes": float(args.get("bytes_accessed", 0) or 0),
        })
        rec["us"] += dur
        rec["count"] += 1
        total += dur
    return ops, total, paths[-1]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--trace_dir", type=str, default="/tmp/dwcgan_profile")
    ap.add_argument("--out", type=str, default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "profile_results.json"))
    ap.add_argument("--parse_only", action="store_true",
                    help="re-parse an existing trace dir")
    ap.add_argument("--mode", choices=["train", "infer"], default="train",
                    help="profile the fused train step or the serving forward")
    args = ap.parse_args()

    step_s = None
    if not args.parse_only:
        step_s = capture(args.trace_dir, args.steps, args.batch, args.mode)
        print(f"median step: {step_s * 1e3:.1f} ms "
              f"({args.batch / step_s:.1f} img/s)")

    ops, total_us, path = parse_trace(args.trace_dir)
    per_step_us = total_us / max(args.steps, 1)
    print(f"trace: {path}")
    print(f"device op time: {total_us / 1e3:.1f} ms total, "
          f"{per_step_us / 1e3:.1f} ms/step over {args.steps} steps")

    rows = sorted(ops.items(), key=lambda kv: -kv[1]["us"])
    print(f"\n{'op':<40} {'category':<22} {'ms/step':>8} {'%':>6} "
          f"{'TFLOP/s':>8} {'GB/s':>7}")
    for name, r in rows[:30]:
        sec = r["us"] / 1e6  # total over all captured steps
        tf = r["flops"] * r["count"] / sec / 1e12 if r["flops"] else 0.0
        gbs = r["bytes"] * r["count"] / sec / 1e9 if r["bytes"] else 0.0
        print(f"{name[:40]:<40} {r['category'][:22]:<22} "
              f"{r['us'] / args.steps / 1e3:8.3f} "
              f"{100 * r['us'] / total_us:6.2f} {tf:8.1f} {gbs:7.1f}")

    cats = {}
    for name, r in ops.items():
        c = cats.setdefault(r["category"], {"us": 0.0, "flops": 0.0,
                                            "bytes": 0.0})
        c["us"] += r["us"]
        c["flops"] += r["flops"] * r["count"]
        c["bytes"] += r["bytes"] * r["count"]
    print("\ncategories (ms/step):")
    for cat, c in sorted(cats.items(), key=lambda kv: -kv[1]["us"]):
        sec = c["us"] / 1e6
        tf = c["flops"] / sec / 1e12 if sec else 0.0
        gbs = c["bytes"] / sec / 1e9 if sec else 0.0
        print(f"  {cat:<24} {c['us'] / args.steps / 1e3:9.3f}  "
              f"({100 * c['us'] / total_us:5.1f}%)  avg {tf:7.1f} TF/s "
              f"{gbs:7.1f} GB/s")

    with open(args.out, "w") as f:
        json.dump({
            "batch": args.batch, "steps": args.steps,
            "median_step_s": step_s,
            "device_us_per_step": per_step_us,
            "categories_us_per_step": {c: v["us"] / args.steps
                                       for c, v in cats.items()},
            "ops": {n: {"us_per_step": r["us"] / args.steps,
                        "count": r["count"] // args.steps,
                        "category": r["category"],
                        "flops": r["flops"], "bytes": r["bytes"]}
                    for n, r in rows[:120]},
        }, f, indent=1)
    print(f"\nwrote {args.out}")


if __name__ == "__main__":
    main()
