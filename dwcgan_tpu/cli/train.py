"""Training CLI (reference `train.py` equivalent).

    python -m dwcgan_tpu.cli.train --config configs/celeba_faces.yaml \
        --output_path outputs --resume 0

Differences from the reference driver by design (all TPU-first):
- everything per-iteration happens inside one jitted step on the mesh
- checkpoints are lossless Orbax snapshots of the whole TrainState
- sampling grids are rendered from the EMA generator
- `--synthetic_data` runs the full pipeline without CelebA on disk
  (random images + genuinely synthesized commands)
"""

from __future__ import annotations

import argparse
import os
import pickle
import shutil

import jax
import jax.numpy as jnp
import numpy as np

from dwcgan_tpu.config import load_config
from dwcgan_tpu.data.celeba import CelebADataset
from dwcgan_tpu.data.pipeline import Batch, DataPipeline, shard_batch, synthetic_batch
from dwcgan_tpu.models.generator import build_embedding_matrix
from dwcgan_tpu.parallel.mesh import create_mesh, place_state
from dwcgan_tpu.text.vocab import Vocab
from dwcgan_tpu.train.checkpoint import CheckpointManager
from dwcgan_tpu.train.sampler import make_sample_fn
from dwcgan_tpu.train.state import build_models, create_train_state, make_optimizer
from dwcgan_tpu.train.step import make_train_step
from dwcgan_tpu.utils.html import write_html_gallery
from dwcgan_tpu.utils.images import save_image_grid
from dwcgan_tpu.utils.logging import MetricWriter
from dwcgan_tpu.utils.timer import StepTimer


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="DWC-GAN TPU training")
    p.add_argument("--config", type=str, default="configs/celeba_faces.yaml")
    p.add_argument("--output_path", type=str, default=".")
    p.add_argument("--resume", type=int, default=0)
    p.add_argument("--use_pretrained_embed", type=int, default=1)
    p.add_argument("--n_critic", type=int, default=None,
                   help="override config n_critic")
    p.add_argument("--max_steps", type=int, default=None,
                   help="override config max_iter")
    p.add_argument("--synthetic_data", action="store_true",
                   help="train on synthetic batches (no CelebA needed)")
    p.add_argument("--procedural_data", action="store_true",
                   help="train on procedural label-controlled faces "
                        "(quality evidence without CelebA; data/procedural.py)")
    p.add_argument("--procedural_size", type=int, default=20000,
                   help="procedural dataset size (train split)")
    p.add_argument("--mesh_model", type=int, default=None,
                   help="override tensor-parallel axis size")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a jax.profiler trace of steps 10-20 here")
    return p.parse_args(argv)


def load_pretrained_embeddings(path):
    """The reference ships a pickled OrderedDict[word -> float32[300]]
    (tools/build_embeddings.py); accept pickle, pickled .npy, or .npz."""
    if not path or not os.path.exists(path):
        return None
    try:
        with open(path, "rb") as f:
            return pickle.load(f)
    except Exception:
        pass
    try:
        data = np.load(path, allow_pickle=True)
    except Exception:
        print(f"could not read pretrained embeddings at {path}; ignoring")
        return None
    if hasattr(data, "files"):  # NpzFile: {word: vector} arrays
        return {k: data[k] for k in data.files}
    if hasattr(data, "item") and data.dtype == object:
        return data.item()
    print(f"unrecognized embedding format at {path}; ignoring")
    return None


class SyntheticDataset:
    """Map-style dataset over freshly synthesized batches."""

    def __init__(self, cfg, size=4096):
        self.cfg, self.size = cfg, size

    def __len__(self):
        return self.size

    def __getitem__(self, i):
        b = synthetic_batch(1, self.cfg.image_size, self.cfg.gen.num_cls,
                            self.cfg.max_text_len, seed=i, dataset=self.cfg.dataset)
        return (b.image[0], b.src_label[0], b.trg_label[0], b.txt[0], b.txt_len[0])


def main(argv=None):
    from dwcgan_tpu.utils.compile_cache import enable as enable_compile_cache
    enable_compile_cache()

    args = parse_args(argv)
    cfg = load_config(args.config)
    if args.n_critic is not None:
        cfg.n_critic = max(1, args.n_critic)
    if args.max_steps is not None:
        cfg.max_iter = args.max_steps
    if args.mesh_model is not None:
        cfg.mesh_model = args.mesh_model

    vocab = Vocab(cfg.dataset)
    embed_table = None
    if args.use_pretrained_embed:
        pre = load_pretrained_embeddings(cfg.pretrained_embed)
        if pre is not None:
            embed_table = build_embedding_matrix(vocab, cfg.gen.embed_dim, pre,
                                                 seed=cfg.seed)
            print(f"loaded pretrained embeddings for vocab of {vocab.size}")

    # --- mesh + state ---
    from dwcgan_tpu.parallel.mesh import maybe_initialize_distributed
    maybe_initialize_distributed()
    mesh = create_mesh(cfg.mesh_data, cfg.mesh_model)
    print(f"mesh: {dict(mesh.shape)} over {len(mesh.devices.flat)} devices")
    assert cfg.batch_size % mesh.shape["data"] == 0, (
        f"batch_size {cfg.batch_size} must be divisible by the data mesh "
        f"axis ({mesh.shape['data']}); set batch_size or mesh_data accordingly")
    rng = jax.random.PRNGKey(cfg.seed)
    state = create_train_state(cfg, rng, vocab.size, embed_table)
    n_gen = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.gen_params))
    n_dis = sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(state.dis_params))
    print(f"The number of parameters in G: {n_gen}")
    print(f"The number of parameters in D: {n_dis}")
    state = place_state(state, mesh, use_tp=cfg.mesh_model > 1)

    gen, dis = build_models(cfg, vocab.size, embed_table)
    gen_tx = make_optimizer(cfg, state.gen_params,
                            freeze_embedding=embed_table is not None)
    dis_tx = make_optimizer(cfg, state.dis_params)

    # optional perceptual loss (reference gates on vgg_w + weight availability,
    # solver.py:79-83; weights come from cli.convert_vgg — no egress here)
    vgg_loss_fn = None
    if cfg.vgg_w > 0:
        vgg_path = cfg.vgg_model_path or os.path.join(args.output_path,
                                                      "models", "vgg16.npz")
        from dwcgan_tpu.models.vgg import (
            init_random_vgg, load_vgg_params, make_vgg_loss_fn)
        dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
        if os.path.exists(vgg_path):
            vgg_loss_fn = make_vgg_loss_fn(load_vgg_params(vgg_path), dtype=dtype)
            print(f"perceptual loss on (weights: {vgg_path})")
        elif cfg.vgg_random_fallback:
            # zero-egress: pretrained weights may be unavailable.  Random
            # VGG features still give a structure-sensitive perceptual
            # distance and keep the step's cost/loss graph matching the
            # reference recipe (vgg_w 0.1, configs/celeba_faces.yaml:34).
            vgg_loss_fn = make_vgg_loss_fn(init_random_vgg(cfg.seed), dtype=dtype)
            print(f"WARNING: vgg_w={cfg.vgg_w} but no weights at {vgg_path}; "
                  "using RANDOM-INIT VGG features (vgg_random_fallback). "
                  "Build real weights with cli.convert_vgg for paper parity.")
        else:
            print(f"vgg_w={cfg.vgg_w} but no weights at {vgg_path}; "
                  "perceptual loss off (build with cli.convert_vgg)")

    train_step = jax.jit(make_train_step(cfg, gen, dis, gen_tx, dis_tx,
                                         vgg_loss_fn=vgg_loss_fn),
                         donate_argnums=0)
    sample_fn = jax.jit(make_sample_fn(cfg, gen))

    # --- output dirs (reference layout: outputs/<name>/{checkpoints,images}) ---
    model_name = os.path.splitext(os.path.basename(args.config))[0]
    out_dir = os.path.join(args.output_path, "outputs", model_name)
    img_dir = os.path.join(out_dir, "images")
    ckpt_dir = os.path.join(out_dir, "checkpoints")
    log_dir = os.path.join(args.output_path, "logs", model_name)
    os.makedirs(img_dir, exist_ok=True)
    shutil.copy(args.config, os.path.join(out_dir, "config.yaml"))
    writer = MetricWriter(log_dir)
    ckpt = CheckpointManager(ckpt_dir, max_to_keep=cfg.ckpt_keep)

    if cfg.use_pretrain and cfg.gen_pretrain:
        # partial warm-start skipping the embedding table (solver.py:383-400);
        # gen_pretrain points at an orbax checkpoint dir of a previous run
        from dwcgan_tpu.train.checkpoint import warm_start
        state = warm_start(state, cfg.gen_pretrain)
        print("Initial model loaded...")

    if args.resume and ckpt.latest_step() is not None:
        state = ckpt.restore(state)
        print(f"Resume from iteration {int(state.step)}")

    # --- data ---
    if args.procedural_data:
        from dwcgan_tpu.data.procedural import ProceduralFaceDataset
        dataset = ProceduralFaceDataset(
            n_samples=args.procedural_size, image_size=cfg.image_size,
            seed=cfg.seed, mode="train", max_text_len=cfg.max_text_len,
            dataset=cfg.dataset)
        test_dataset = ProceduralFaceDataset(
            n_samples=max(cfg.display_size, 512), image_size=cfg.image_size,
            seed=cfg.seed + 777, mode="test", max_text_len=cfg.max_text_len,
            dataset=cfg.dataset)
    elif args.synthetic_data or not os.path.exists(cfg.attr_path):
        if not args.synthetic_data:
            print(f"attr file {cfg.attr_path} not found -> synthetic data")
        dataset = SyntheticDataset(cfg)
        test_dataset = dataset
    else:
        dataset = CelebADataset(cfg.data_root, cfg.attr_path, mode="train",
                                crop_size=cfg.crop_size, image_size=cfg.image_size,
                                max_text_len=cfg.max_text_len, seed=cfg.seed,
                                test_split=cfg.test_split)
        test_dataset = CelebADataset(cfg.data_root, cfg.attr_path, mode="test",
                                     crop_size=cfg.crop_size,
                                     image_size=cfg.image_size,
                                     max_text_len=cfg.max_text_len, seed=cfg.seed,
                                     test_split=cfg.test_split)
    # cfg.batch_size is the GLOBAL batch: each process loads only its own
    # rows (disjoint per-epoch slices inside DataPipeline) and contributes
    # them via jax.make_array_from_process_local_data in shard_batch —
    # proven by tests/test_multihost.py::test_two_process_real_datapipeline
    n_proc = jax.process_count()
    assert cfg.batch_size % n_proc == 0, (
        f"batch_size {cfg.batch_size} must be divisible by the process "
        f"count ({n_proc})")
    pipe = DataPipeline(dataset, cfg.batch_size // n_proc,
                        num_workers=cfg.num_workers, seed=cfg.seed)

    def fixed_display(ds, n):
        items = [ds[i] for i in range(n)]
        return Batch(*(np.stack([it[k] for it in items]) for k in range(5)))

    def to_dev(b):
        return shard_batch(b, mesh) if cfg.display_size % mesh.shape["data"] == 0 \
            else Batch(*(jax.device_put(np.asarray(x)) for x in b))

    disp_dev = to_dev(fixed_display(test_dataset, cfg.display_size))
    disp_train_dev = to_dev(fixed_display(dataset, cfg.display_size))

    def render(tag, step_i, train=False):
        att_on = np.asarray(cfg.gen.use_attention
                            and step_i >= cfg.attention_warm_iter)
        d = disp_train_dev if train else disp_dev
        rows = sample_fn(state.ema_gen_params, jax.random.PRNGKey(step_i),
                         d.image, d.txt, d.txt_len, att_on)
        save_image_grid([np.asarray(r) for r in rows], cfg.display_size,
                        os.path.join(img_dir, f"{tag}.jpg"))

    # --- loop ---
    from dwcgan_tpu.utils.guard import FiniteGuard, StallWatchdog
    # cadence/patience are config knobs (cfg.guard_every 0 = ride log_iter,
    # whose scalars are fetched anyway); worst-case NaN exposure is
    # guard_every * guard_patience steps — rationale in config.py
    guard = FiniteGuard(every=cfg.guard_every or cfg.log_iter,
                        patience=cfg.guard_patience)
    # silent-device-wedge detector (docs/PERF.md "relay wedge"): when the
    # host blocks on a device fetch with no progress, shout with the last
    # completed step so an operator (or supervisor) can kill + --resume 1
    watchdog = StallWatchdog(timeout_s=300.0)
    profiler_active = False
    timer = StepTimer()
    timer.lap()
    # host-side step counter: reading int(state.step) every iteration would
    # force a device sync per step and serialize host data prep with device
    # compute (state.step is only consulted on resume)
    step_i = int(state.step)
    # bounded dispatch run-ahead: without a throttle the host enqueues steps
    # far faster than the device executes, pinning every queued batch
    # (observed: >40GB host RSS and a stalled run).  Keep <= MAX_INFLIGHT
    # steps outstanding by draining the oldest step's loss scalar.
    import collections
    MAX_INFLIGHT = 8
    inflight = collections.deque()
    # try/finally: FiniteGuard raising on NaN (its designed tripwire path)
    # or any loop exception must still stop the watchdog thread, drain and
    # close the async checkpoint manager, and close the writer — a lingering
    # async committer aborts the process when another manager saves later in
    # the same interpreter (ADVICE r2; observed as native Fatal aborts)
    try:
        for batch in pipe:
            if step_i >= cfg.max_iter:
                break
            if len(inflight) >= MAX_INFLIGHT:
                jax.device_get(inflight.popleft())
            if args.profile_dir and step_i == 10 and not profiler_active:
                jax.profiler.start_trace(args.profile_dir)
                profiler_active = True
            state, metrics = train_step(state, shard_batch(batch, mesh))
            inflight.append(metrics["loss_gen_total"])
            if profiler_active and step_i >= 20:
                jax.device_get(metrics["loss_gen_total"])
                jax.profiler.stop_trace()
                profiler_active = False
                print(f"profiler trace written to {args.profile_dir}")
            # NaN tripwire (fetches scalars only on its `every` cadence)
            guard.check(step_i + 1, metrics, checkpoint=ckpt, state=state)

            if (step_i + 1) % cfg.log_iter == 0:
                dt = timer.lap(metrics["loss_gen_total"])
                sps = cfg.log_iter / dt if dt > 0 else 0.0
                writer.write(step_i + 1, {**metrics,
                                          "steps_per_sec": sps,
                                          "images_per_sec": sps * cfg.batch_size})
                print(f"Iteration: {step_i + 1:08d}/{cfg.max_iter:08d} "
                      f"gen {float(metrics['loss_gen_total']):.4f} "
                      f"dis {float(metrics['loss_dis_all']):.4f} "
                      f"lr {float(metrics['lr']):.6g} {sps:.2f} it/s")

            if (step_i + 1) % cfg.image_display_iter == 0:
                render("train_current", step_i)
            if (step_i + 1) % cfg.image_save_iter == 0:
                render(f"test_{step_i + 1:08d}", step_i)
                render(f"train_{step_i + 1:08d}", step_i, train=True)
                write_html_gallery(os.path.join(out_dir, "index.html"),
                                   step_i + 1, cfg.image_save_iter)
            if (step_i + 1) % cfg.snapshot_save_iter == 0:
                ckpt.save(state)
            step_i += 1
            # host-side beat: a wedged device blocks this loop within
            # MAX_INFLIGHT iterations, so silence here means device stall
            watchdog.beat(step_i)

        # final snapshot (clean exit only — a FiniteGuard trip means the
        # state may be poisoned and must NOT be saved): drain any in-flight
        # async save first, and skip when the loop already saved this exact
        # step — a second save of the same step racing the un-finalized
        # async one collides in the checkpoint layer
        ckpt.wait()
        if ckpt.latest_step() is None or ckpt.latest_step() < step_i:
            ckpt.save(state, wait=True)
        print("Finish training")
    finally:
        watchdog.stop()
        if profiler_active:
            jax.profiler.stop_trace()
            print(f"profiler trace written to {args.profile_dir}")
        # release the manager's background threads even on the exception path
        try:
            ckpt.wait()
        finally:
            ckpt.close()
            writer.close()


if __name__ == "__main__":
    main()
