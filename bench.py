"""Headline benchmark: full fused-train-step throughput on one TPU chip.

Measures images/sec/chip for the flagship CelebA 128px configuration (the
full D+G update: 4 encoder passes, 5 decoder passes, text encoder, both
multi-scale D passes, both optimizers, EMA — SURVEY §3.2-3.3), bfloat16
compute, synthetic batches (the reference trains on 128px CelebA; image
content does not affect throughput).

vs_baseline: the reference publishes NO numbers (BASELINE.md) and no GPU
exists in this environment, so the PRIMARY ratio reported is the
same-hardware framework ratio — both frameworks measured on this host's
CPU (tools/bench_reference.py executes the reference unchanged from
/root/reference; tools/baseline_measured.json records both).  The
cross-hardware ratio (our TPU chip vs the reference on one CPU core, the
only hardware it runs on here) is emitted as context under
`vs_reference_cross_hardware`, with the denominator's provenance inline.
If the measured file is absent we fall back to the round-1 documented GPU
estimate (batch 1 at ~0.35 s/iter => 2.86 img/s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import numpy as np

REFERENCE_IMGS_PER_SEC_ESTIMATE = 2.86        # full train step, batch 1 (GPU est.)
REFERENCE_INFER_IMGS_PER_SEC_ESTIMATE = 30.0  # forward-only translation, batch 1


def _measured_rows():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "baseline_measured.json")
    try:
        with open(path) as f:
            return list(json.load(f).values())
    except Exception:
        return []


def _measured_file_mtime():
    """ISO mtime of the measured-baseline file, surfaced in the provenance
    dict so a stale pre-recorded ratio is visible next to the fresh value
    (ADVICE r3)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "baseline_measured.json")
    try:
        return time.strftime("%Y-%m-%dT%H:%M:%SZ",
                             time.gmtime(os.path.getmtime(path)))
    except OSError:
        return None


def _best_match(rows, impl, vgg, batch):
    """Pick the measured row for `impl` matching this bench's vgg setting,
    preferring the batch closest to the live BENCH_BATCH (ADVICE r3), so a
    later re-measurement at different settings cannot silently change the
    headline ratio (ADVICE r2)."""
    cand = [r for r in rows if r.get("impl") == impl and r.get("vgg") == vgg]
    if not cand:
        cand = [r for r in rows if r.get("impl") == impl]
    return min(cand, key=lambda r: abs(r.get("batch", 0) - batch)) if cand else None


def reference_denominator(vgg: bool, batch: int):
    """(img/s, provenance dict) of the measured reference-torch run, else
    the documented estimate."""
    row = _best_match(_measured_rows(), "reference-torch", vgg, batch)
    if row:
        prov = {k: row[k] for k in ("impl", "device", "batch",
                                    "images_per_sec", "vgg") if k in row}
        prov["measured_file_mtime"] = _measured_file_mtime()
        return row["images_per_sec"], prov
    return REFERENCE_IMGS_PER_SEC_ESTIMATE, {
        "impl": "reference-torch", "device": "gpu-estimate",
        "images_per_sec": REFERENCE_IMGS_PER_SEC_ESTIMATE}


def same_hardware_ratio(vgg: bool, batch: int):
    """Framework-vs-framework ratio on IDENTICAL hardware (both on this
    host's CPU, tools/bench_reference.py) — the decision-grade comparison;
    the TPU-vs-CPU ratio conflates hardware with framework."""
    rows = _measured_rows()
    ours = _best_match(rows, "dwcgan_tpu-jax", vgg, batch)
    ref = _best_match(rows, "reference-torch", vgg, batch)
    if ours and ref and ref["images_per_sec"] > 0:
        return round(ours["images_per_sec"] / ref["images_per_sec"], 3)
    return None


# bf16 peak FLOP/s per chip by device kind (dense-matmul peak; the MFU
# denominator).  Overridable via BENCH_PEAK_TFLOPS for new hardware.
_PEAK_TFLOPS_BY_KIND = {
    "tpu v5 lite": 197.0, "tpu v5e": 197.0,
    "tpu v4": 275.0, "tpu v5p": 459.0, "tpu v5": 459.0,
    "tpu v6 lite": 918.0, "tpu v6e": 918.0,
}


def _peak_flops():
    import jax
    env = os.environ.get("BENCH_PEAK_TFLOPS")
    if env:
        return float(env) * 1e12
    kind = jax.devices()[0].device_kind.lower()
    for k, v in _PEAK_TFLOPS_BY_KIND.items():
        if k in kind:
            return v * 1e12
    return None


def _flops_per_execution(compiled):
    """Whole-program model FLOPs from XLA's cost analysis of the compiled
    step (the same counter tools/profile_step.py reads per-op as
    `model_flops`).  Returns None where the backend doesn't expose it."""
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        flops = float(ca.get("flops", 0.0))
        return flops if flops > 0 else None
    except Exception:
        return None


def _wait_for_backend():
    """Bounded wait for the accelerator backend before committing to it.

    The axon relay can be down for hours (observed 2026-08-17: a 6h outage
    killed a run mid-save); when it is, `jax.devices()` either raises
    RuntimeError fast or HANGS indefinitely — so the probe runs in a
    subprocess under `timeout`, and this process only imports jax once a
    probe has succeeded.  Wait budget: BENCH_TPU_WAIT_S (default 900 s,
    0 disables).  On a CPU-only environment the first probe succeeds
    immediately (the probe only checks that SOME backend answers)."""
    import subprocess
    import sys

    budget = float(os.environ.get("BENCH_TPU_WAIT_S", "900"))
    probe = ("import jax, jax.numpy as jnp; "
             "assert float((jnp.ones((8,8))@jnp.ones((8,8))).sum()) == 512.0")
    deadline = time.time() + budget
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run([sys.executable, "-c", probe], timeout=240,
                               capture_output=True)
            if r.returncode == 0:
                return
        except subprocess.TimeoutExpired:
            pass
        if time.time() >= deadline or budget <= 0:
            print(f"# backend probe failed after {attempt} attempts "
                  f"({budget:.0f}s budget) — accelerator relay down",
                  file=sys.stderr, flush=True)
            raise SystemExit(2)
        print(f"# backend not answering (attempt {attempt}); retrying",
              file=sys.stderr, flush=True)
        time.sleep(min(60.0, max(5.0, deadline - time.time())))


def main():
    _wait_for_backend()
    import jax

    from dwcgan_tpu.utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache()

    from dwcgan_tpu.config import load_config
    from dwcgan_tpu.data.pipeline import Batch, synthetic_batch
    from dwcgan_tpu.parallel.mesh import create_mesh, place_state, shard_spec
    from dwcgan_tpu.train.state import build_models, create_train_state, make_optimizer
    from dwcgan_tpu.train.step import make_train_step

    batch_size = int(os.environ.get("BENCH_BATCH", "32"))
    steps = int(os.environ.get("BENCH_STEPS", "20"))
    mode = os.environ.get("BENCH_MODE", "train")  # train | infer
    # BENCH_VGG=0 benches the round-1 recipe (no perceptual term); default
    # matches the reference recipe (vgg_w 0.1, ref configs/celeba_faces.yaml:34)
    use_vgg = os.environ.get("BENCH_VGG", "1") != "0"

    cfg = load_config(os.path.join(os.path.dirname(__file__) or ".",
                                   "configs", "celeba_faces.yaml"))
    cfg.batch_size = batch_size
    cfg.attr_path = "/nonexistent"
    if not use_vgg:
        cfg.vgg_w = 0.0
    if os.environ.get("BENCH_REMAT", "0") != "0":
        cfg.remat = True
    # A/B the Pallas norm kernels against the jnp/XLA-native path
    if os.environ.get("BENCH_PALLAS") is not None:
        cfg.use_pallas = os.environ["BENCH_PALLAS"] != "0"
    # A/B the shared G forward against reference-style independent D forward
    if os.environ.get("BENCH_FUSE_GD") is not None:
        cfg.fuse_gd_forward = os.environ["BENCH_FUSE_GD"] != "0"
    # A/B the parity-space boundary-conv rewrites (ops/parity_conv.py):
    # 0/off, stems, head, 1/all
    if os.environ.get("BENCH_PARITY") is not None:
        v = os.environ["BENCH_PARITY"]
        cfg.parity_convs = {"0": False, "1": True}.get(v, v)
    # A/B the norm-statistics strategy: "2pass" (reference-exact) / "1pass"
    # A/B the fused Pallas stem kernel (ops/pallas/stem_kernels.py)
    if os.environ.get("BENCH_STEM") is not None:
        cfg.stem_pallas = os.environ["BENCH_STEM"] != "0"
    if os.environ.get("BENCH_NORM_STATS"):
        cfg.norm_stats = os.environ["BENCH_NORM_STATS"]
    # A/B the normalize-arithmetic precision ("fp32"/"bf16", ops/norms.py)
    if os.environ.get("BENCH_NORM_COMPUTE"):
        cfg.norm_compute = os.environ["BENCH_NORM_COMPUTE"]

    n_dev = len(jax.devices())
    mesh = create_mesh(data=n_dev, model=1)

    if mode == "infer":
        _bench_infer(cfg, mesh, batch_size, steps, n_dev)
        return

    state = create_train_state(cfg, jax.random.PRNGKey(0), vocab_size=102)
    state = place_state(state, mesh, use_tp=False)
    gen, dis = build_models(cfg, 102)
    gen_tx = make_optimizer(cfg, state.gen_params)
    dis_tx = make_optimizer(cfg, state.dis_params)
    vgg_loss_fn = None
    if cfg.vgg_w > 0:
        # random-init weights are throughput-equivalent to pretrained ones
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

    # AOT-compile once: the executable serves both the timed loop and the
    # whole-step MFU numerator (XLA cost-analysis FLOPs), so the FLOP count
    # describes exactly the program being timed.  If AOT is unavailable on
    # the backend, fall back to plain jit (mfu omitted, bench still runs).
    flops_per_step = None
    try:
        compiled = step_fn.lower(state, batch).compile()
        flops_per_step = _flops_per_execution(compiled)
        step_fn = compiled
    except Exception as e:  # pragma: no cover - backend-specific
        print(f"# AOT cost analysis unavailable ({type(e).__name__}); "
              f"mfu omitted", flush=True)

    # warmup: 3 steady steps
    for _ in range(3):
        state, metrics = step_fn(state, batch)
    _ = float(metrics["loss_gen_total"])

    # Timing methodology: enqueue a CHUNK of steps back-to-back, then host-
    # fetch the last chunk's loss once.  Each step consumes the previous
    # state so the device still executes them strictly serially — but the
    # per-step host->device dispatch overlaps device compute, exactly like
    # the training loop's bounded run-ahead (cli/train.py MAX_INFLIGHT).
    # The fetch must be a device->host transfer of a computed value:
    # through the axon loopback relay, block_until_ready returns before
    # device work completes (observed 50-100x-too-fast "measurements").
    # Per-step fetch timing (the round-1/2 method) charges a full relay
    # round-trip to every step: ~30 ms/step of pure host latency that
    # real training pipelines away (profiling: 289 ms device vs 321 ms
    # wall at batch 32, tools/profile_results.json).
    chunk = max(5, steps // 2)
    rates = []
    last_loss = None
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(chunk):
            state, metrics = step_fn(state, batch)
        last_loss = float(metrics["loss_gen_total"])  # syncs the chunk
        rates.append((time.perf_counter() - t0) / chunk)
    dt = float(np.median(rates))

    assert np.isfinite(last_loss), "non-finite loss"
    imgs_per_sec = batch_size / dt
    imgs_per_sec_per_chip = imgs_per_sec / n_dev

    # vs_baseline = framework ratio on IDENTICAL hardware (this host's CPU;
    # tools/baseline_measured.json) — the honest comparison.  The
    # cross-hardware ratio (our TPU chip / reference on this host's one CPU
    # core, the only hardware the reference runs on here) is reported
    # separately with its denominator's provenance.
    ref_img_s, prov = reference_denominator(use_vgg, batch_size)
    same_hw = same_hardware_ratio(use_vgg, batch_size)
    out = {
        "metric": "train_images_per_sec_per_chip_128px",
        "value": round(imgs_per_sec_per_chip, 2),
        "unit": "images/sec/chip",
        "vs_baseline": same_hw if same_hw is not None
        else round(imgs_per_sec_per_chip / ref_img_s, 2),
        "vs_baseline_kind": "same_hardware_framework_ratio_cpu"
        if same_hw is not None else "cross_hardware_ratio",
        "vs_reference_cross_hardware": round(imgs_per_sec_per_chip / ref_img_s, 2),
        "reference_denominator": prov,
    }
    # whole-step MFU: model FLOPs of the timed executable / wall time / peak
    peak = _peak_flops()
    if flops_per_step is not None and peak:
        out["mfu"] = round(flops_per_step / dt / peak, 4)
        out["model_tflops_per_step"] = round(flops_per_step / 1e12, 3)
        out["peak_tflops"] = peak / 1e12
    print(json.dumps(out))


def _bench_infer(cfg, mesh, batch_size, steps, n_dev):
    """Serving throughput: text-guided translation forward (EMA-style path)."""
    import jax

    from dwcgan_tpu.data.pipeline import Batch, synthetic_batch
    from dwcgan_tpu.parallel.mesh import shard_spec
    from dwcgan_tpu.train.sampler import make_infer_fn
    from dwcgan_tpu.train.state import build_models, create_train_state

    state = create_train_state(cfg, jax.random.PRNGKey(0), vocab_size=102)
    gen, _ = build_models(cfg, 102)
    infer = jax.jit(make_infer_fn(cfg, gen))
    b = synthetic_batch(batch_size, cfg.image_size, seed=0)
    batch = Batch(*(jax.device_put(np.asarray(x), shard_spec(mesh, x.ndim))
                    for x in b))
    out = infer(state.gen_params, batch.image, batch.txt, batch.txt_len)
    _ = np.asarray(out[0, 0, 0, 0])
    # chunked timing (see main): serving dispatch also overlaps compute
    chunk = max(5, steps // 2)
    rates = []
    for _i in range(3):
        t0 = time.perf_counter()
        for _ in range(chunk):
            out = infer(state.gen_params, batch.image, batch.txt, batch.txt_len)
        _ = np.asarray(out[0, 0, 0, 0])  # host fetch: honest sync
        rates.append((time.perf_counter() - t0) / chunk)
    dt = float(np.median(rates))
    print(json.dumps({
        "metric": "infer_images_per_sec_per_chip_128px",
        "value": round(batch_size / dt / n_dev, 2),
        "unit": "images/sec/chip",
        # vs an *inference* estimate of the reference (forward-only, batch 1)
        "vs_baseline": round(batch_size / dt / n_dev
                             / REFERENCE_INFER_IMGS_PER_SEC_ESTIMATE, 2),
    }))


if __name__ == "__main__":
    main()
