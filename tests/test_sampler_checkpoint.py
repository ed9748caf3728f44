"""Sampler/infer functions, checkpoint round-trip, and a CLI smoke run."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dwcgan_tpu.config import config_from_dict
from dwcgan_tpu.data.pipeline import synthetic_batch
from dwcgan_tpu.train.checkpoint import CheckpointManager
from dwcgan_tpu.train.sampler import make_infer_fn, make_sample_fn
from dwcgan_tpu.train.state import build_models, create_train_state


def tiny_cfg(**over):
    base = {
        "batch_size": 4, "image_size": 32, "crop_size": 40,
        "compute_dtype": "float32",
        "gen": {"dim": 8, "mlp_dim": 16, "style_downsample": 3,
                "content_downsample": 2, "n_res": 2, "embed_dim": 12,
                "hidden_size": 12, "num_layers": 2},
        "dis": {"dim": 8, "n_layer": 3, "num_scales": 2, "image_size": 32},
    }
    base.update(over)
    return config_from_dict(base)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    state = create_train_state(cfg, jax.random.PRNGKey(0), 102)
    gen, _ = build_models(cfg, 102)
    b = synthetic_batch(4, 32, seed=0)
    return cfg, state, gen, b


def test_infer_fn(setup):
    cfg, state, gen, b = setup
    infer = make_infer_fn(cfg, gen)
    out = infer(state.gen_params, jnp.asarray(b.image), jnp.asarray(b.txt),
                jnp.asarray(b.txt_len))
    assert out.shape == (4, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_sample_fn_rows(setup):
    cfg, state, gen, b = setup
    sample = make_sample_fn(cfg, gen)
    rows = sample(state.ema_gen_params, jax.random.PRNGKey(1),
                  jnp.asarray(b.image), jnp.asarray(b.txt),
                  jnp.asarray(b.txt_len), jnp.asarray(True))
    # real, recon, text-guided, sampled + attention (use_attention default on)
    assert len(rows) == 5
    for r in rows:
        assert r.shape == (4, 32, 32, 3)
    np.testing.assert_allclose(np.asarray(rows[0]), b.image, atol=1e-6)


def test_checkpoint_roundtrip(setup, tmp_path):
    cfg, state, gen, b = setup
    mgr = CheckpointManager(str(tmp_path / "ckpt"))
    state = state.replace(step=jnp.asarray(7, jnp.int32))
    assert mgr.save(state, wait=True)
    assert mgr.latest_step() == 7

    template = create_train_state(cfg, jax.random.PRNGKey(99), 102)
    restored = mgr.restore(template)
    assert int(restored.step) == 7
    for a, bb in zip(jax.tree_util.tree_leaves(state.gen_params),
                     jax.tree_util.tree_leaves(restored.gen_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))
    # optimizer state round-trips too (the reference loses it, solver.py:370)
    for a, bb in zip(jax.tree_util.tree_leaves(state.gen_opt_state),
                     jax.tree_util.tree_leaves(restored.gen_opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(bb))
    mgr.close()


def test_cli_smoke(tmp_path):
    """Full driver end-to-end on the CPU mesh: 3 steps, synthetic data."""
    import yaml
    from dwcgan_tpu.cli.train import main

    cfg = {
        "dataset": "CelebA", "max_iter": 3, "batch_size": 8,
        "image_size": 32, "crop_size": 40, "compute_dtype": "float32",
        "log_iter": 1, "image_display_iter": 2, "image_save_iter": 100,
        "snapshot_save_iter": 100, "display_size": 4,
        "attr_path": "/nonexistent", "pretrained_embed": None,
        "gen": {"dim": 8, "mlp_dim": 16, "style_downsample": 3,
                "content_downsample": 2, "n_res": 2, "embed_dim": 12,
                "hidden_size": 12, "num_layers": 2},
        "dis": {"dim": 8, "n_layer": 3, "num_scales": 2, "image_size": 32},
    }
    cfg_path = tmp_path / "cli_smoke.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    main(["--config", str(cfg_path), "--output_path", str(tmp_path),
          "--synthetic_data"])
    out = tmp_path / "outputs" / "cli_smoke"
    assert (out / "images" / "train_current.jpg").exists()
    assert (out / "checkpoints").exists()
    assert (tmp_path / "logs" / "cli_smoke" / "metrics.jsonl").exists()
