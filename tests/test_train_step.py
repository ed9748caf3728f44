"""End-to-end tests of the fused train step on the 8-device CPU mesh:
data-parallel execution, determinism, n_critic gating, penalties,
frozen embeddings, EMA, and schedules."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dwcgan_tpu.config import config_from_dict
from dwcgan_tpu.data.pipeline import Batch, synthetic_batch
from dwcgan_tpu.parallel.mesh import create_mesh, place_state, shard_spec
from dwcgan_tpu.train.schedules import lr_schedule
from dwcgan_tpu.train.state import build_models, create_train_state, make_optimizer
from dwcgan_tpu.train.step import make_train_step


def tiny_cfg(**over):
    base = {
        "batch_size": 8,
        "image_size": 32,
        "crop_size": 40,
        "compute_dtype": "float32",
        "gen": {"dim": 8, "mlp_dim": 16, "style_downsample": 3,
                "content_downsample": 2, "n_res": 2, "embed_dim": 12,
                "hidden_size": 12, "num_layers": 2},
        "dis": {"dim": 8, "n_layer": 3, "num_scales": 2, "image_size": 32},
    }
    for k, v in over.items():
        if isinstance(v, dict) and k in base:
            base[k].update(v)
        else:
            base[k] = v
    return config_from_dict(base)


def make_everything(cfg, embed_table=None, seed=0):
    state = create_train_state(cfg, jax.random.PRNGKey(seed), vocab_size=102,
                               embed_table=embed_table)
    gen, dis = build_models(cfg, 102, embed_table)
    gen_tx = make_optimizer(cfg, state.gen_params,
                            freeze_embedding=embed_table is not None)
    dis_tx = make_optimizer(cfg, state.dis_params)
    step_fn = jax.jit(make_train_step(cfg, gen, dis, gen_tx, dis_tx),
                      donate_argnums=0)
    return state, step_fn


def device_batch(cfg, mesh, seed=0):
    b = synthetic_batch(cfg.batch_size, cfg.image_size, seed=seed)
    return Batch(*(jax.device_put(np.asarray(x), shard_spec(mesh, x.ndim))
                   for x in b))


def _leaf_delta(a, b):
    return max(float(jnp.abs(x - y).max())
               for x, y in zip(jax.tree_util.tree_leaves(a),
                               jax.tree_util.tree_leaves(b)))


def test_train_step_runs_and_updates():
    cfg = tiny_cfg()
    mesh = create_mesh()
    assert mesh.shape["data"] == 8
    state, step_fn = make_everything(cfg)
    state = place_state(state, mesh)
    init_gen = jax.tree_util.tree_map(np.asarray, state.gen_params)
    init_dis = jax.tree_util.tree_map(np.asarray, state.dis_params)

    metrics = None
    for i in range(2):
        state, metrics = step_fn(state, device_batch(cfg, mesh, seed=i))
    assert int(state.step) == 2
    for k, v in metrics.items():
        assert np.isfinite(float(v)), f"{k} not finite"
    assert float(metrics["loss_gen_total"]) != 0.0
    assert float(metrics["loss_dis_all"]) > 0.0
    # both nets actually moved
    assert _leaf_delta(state.gen_params, init_gen) > 0
    assert _leaf_delta(state.dis_params, init_dis) > 0
    # EMA moved but much less than the raw params (decay 0.999)
    ema_moved = _leaf_delta(state.ema_gen_params, init_gen)
    raw_moved = _leaf_delta(state.gen_params, init_gen)
    assert 0 < ema_moved < raw_moved


@pytest.mark.slow
def test_train_step_deterministic():
    cfg = tiny_cfg()
    mesh = create_mesh()
    outs = []
    for _ in range(2):
        state, step_fn = make_everything(cfg, seed=7)
        state = place_state(state, mesh)
        state, metrics = step_fn(state, device_batch(cfg, mesh, seed=3))
        outs.append(float(metrics["loss_gen_total"]))
    assert outs[0] == outs[1]


@pytest.mark.slow
def test_n_critic_gates_generator():
    cfg = tiny_cfg(n_critic=2)
    mesh = create_mesh()
    state, step_fn = make_everything(cfg)
    state = place_state(state, mesh)
    g0 = jax.tree_util.tree_map(np.asarray, state.gen_params)
    # step 0: (0+1) % 2 != 0 -> G skipped
    state, m = step_fn(state, device_batch(cfg, mesh, seed=0))
    assert _leaf_delta(state.gen_params, g0) == 0
    assert float(m["loss_gen_total"]) == 0.0
    # step 1: G runs
    state, m = step_fn(state, device_batch(cfg, mesh, seed=1))
    assert _leaf_delta(state.gen_params, g0) > 0
    assert float(m["loss_gen_total"]) != 0.0


@pytest.mark.slow
def test_penalties_compile_and_fire():
    cfg = tiny_cfg(use_r1=True, gp_w=0.5, d_reg_every=2)
    mesh = create_mesh()
    state, step_fn = make_everything(cfg)
    state = place_state(state, mesh)
    state, m0 = step_fn(state, device_batch(cfg, mesh, seed=0))  # step 0: (1)%2!=0
    assert float(m0["loss_r1"]) == 0.0
    assert float(m0["loss_gp"]) > 0.0
    state, m1 = step_fn(state, device_batch(cfg, mesh, seed=1))  # step 1: fires
    assert float(m1["loss_r1"]) > 0.0


@pytest.mark.slow
def test_spectral_norm_discriminator_trains():
    """dis norm='sn' (stateless power iteration) works inside the fused step."""
    cfg = tiny_cfg(dis={"norm": "sn", "dim": 8, "n_layer": 3,
                        "num_scales": 2, "image_size": 32})
    mesh = create_mesh()
    state, step_fn = make_everything(cfg)
    state = place_state(state, mesh)
    state, m = step_fn(state, device_batch(cfg, mesh, seed=0))
    assert np.isfinite(float(m["loss_dis_all"]))
    assert np.isfinite(float(m["loss_gen_total"]))


def test_frozen_embedding_stays_fixed():
    table = np.random.default_rng(0).normal(size=(102, 12)).astype(np.float32)
    cfg = tiny_cfg()
    mesh = create_mesh()
    state, step_fn = make_everything(cfg, embed_table=table)
    state = place_state(state, mesh)
    for i in range(2):
        state, _ = step_fn(state, device_batch(cfg, mesh, seed=i))
    emb = np.asarray(state.gen_params["enc_txt"]["embedding"])
    np.testing.assert_array_equal(emb, table)


def test_diversity_weight_decays():
    cfg = tiny_cfg()
    mesh = create_mesh()
    state, step_fn = make_everything(cfg)
    state = place_state(state, mesh)
    state, m0 = step_fn(state, device_batch(cfg, mesh, seed=0))
    state, m1 = step_fn(state, device_batch(cfg, mesh, seed=1))
    # ds_w = max(1 - (iter+1)*1e-5, 0) (solver.py:183)
    np.testing.assert_allclose(float(m0["ds_w"]), 1 - 1e-5, rtol=1e-6)
    np.testing.assert_allclose(float(m1["ds_w"]), 1 - 2e-5, rtol=1e-6)


def test_lr_schedule_step_policy():
    cfg = tiny_cfg(lr_policy="step", step_size=100, gamma=0.5, lr=1e-4)
    f = lr_schedule(cfg)
    np.testing.assert_allclose(float(f(0)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(f(99)), 1e-4, rtol=1e-6)
    np.testing.assert_allclose(float(f(100)), 5e-5, rtol=1e-6)
    np.testing.assert_allclose(float(f(250)), 2.5e-5, rtol=1e-6)


def test_lr_schedule_cosa_restarts():
    cfg = tiny_cfg(lr_policy="cosa", step_size=100, eta_min=0.0, t_mult=1, lr=1e-4)
    f = lr_schedule(cfg)
    np.testing.assert_allclose(float(f(0)), 1e-4, rtol=1e-5)
    assert float(f(50)) == pytest.approx(5e-5, rel=1e-4)
    assert float(f(99)) < 1e-6  # annealed to ~eta_min
    np.testing.assert_allclose(float(f(100)), 1e-4, rtol=1e-5)  # warm restart
    # t_mult=2: second period is twice as long
    cfg2 = tiny_cfg(lr_policy="cosa", step_size=100, eta_min=0.0, t_mult=2, lr=1e-4)
    f2 = lr_schedule(cfg2)
    np.testing.assert_allclose(float(f2(100)), 1e-4, rtol=1e-5)
    assert float(f2(200)) == pytest.approx(5e-5, rel=1e-3)  # midpoint of 2nd period
    np.testing.assert_allclose(float(f2(300)), 1e-4, rtol=1e-4)  # 3rd period start


@pytest.mark.slow
def test_attention_gate_uses_step():
    """Raw decode before iter cfg.attention_warm_iter when attention is
    enabled; blended after.  Validated indirectly: the metric graph must
    not recompile across the threshold (same jitted fn object; the gate is
    a step-indexed predicate inside the program), and losses stay finite.
    Parameterized by the round-5 `attention_warm_iter` knob (default 10000
    = reference parity, solver.py:109-111) — crossing a small custom gate
    here exercises the same code path steps 9999->10001 did."""
    assert tiny_cfg().attention_warm_iter == 10000  # parity default
    cfg = tiny_cfg(attention_warm_iter=5)
    mesh = create_mesh()
    state, step_fn = make_everything(cfg)
    state = place_state(state, mesh)
    state = state.replace(step=jnp.asarray(cfg.attention_warm_iter - 1,
                                           jnp.int32))
    state, m = step_fn(state, device_batch(cfg, mesh, seed=0))
    assert np.isfinite(float(m["loss_gen_total"]))
    state, m = step_fn(state, device_batch(cfg, mesh, seed=1))
    assert int(state.step) == cfg.attention_warm_iter + 1
    assert np.isfinite(float(m["loss_gen_total"]))


def test_shared_forward_matches_manual_composition():
    """The shared-forward step (one G forward; D on stop-gradient'ed shared
    fakes; G's adversarial head pulled back through the saved vjp) must
    produce the same updated parameters and metrics as the direct
    value_and_grad of the full composition with identical keys — pinning
    the chain-rule composition and the key discipline (VERDICT r2 item 2)."""
    cfg = tiny_cfg()
    assert cfg.fuse_gd_forward and cfg.n_critic == 1
    mesh = create_mesh()

    results = []
    for direct in (False, True):
        state = create_train_state(cfg, jax.random.PRNGKey(5), vocab_size=102)
        gen, dis = build_models(cfg, 102)
        gen_tx = make_optimizer(cfg, state.gen_params)
        dis_tx = make_optimizer(cfg, state.dis_params)
        step_fn = jax.jit(make_train_step(cfg, gen, dis, gen_tx, dis_tx,
                                          _shared_direct=direct),
                          donate_argnums=0)
        state = place_state(state, mesh)
        state, metrics = step_fn(state, device_batch(cfg, mesh, seed=11))
        results.append((jax.tree_util.tree_map(np.asarray, state.gen_params),
                        jax.tree_util.tree_map(np.asarray, state.dis_params),
                        {k: float(v) for k, v in metrics.items()}))

    (gp_v, dp_v, m_v), (gp_d, dp_d, m_d) = results
    for k in m_v:
        np.testing.assert_allclose(m_v[k], m_d[k], rtol=2e-4, atol=1e-5,
                                   err_msg=f"metric {k}")
    for a, b in zip(jax.tree_util.tree_leaves(gp_v),
                    jax.tree_util.tree_leaves(gp_d)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)
    for a, b in zip(jax.tree_util.tree_leaves(dp_v),
                    jax.tree_util.tree_leaves(dp_d)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5)


def test_shared_forward_toggle_changes_d_fakes_only_in_distribution():
    """fuse_gd_forward off => reference-style independent D forward; the
    step still runs and trains.  (The two modes draw different fake
    realizations for D by design, so only finiteness/movement is pinned.)"""
    cfg = tiny_cfg(fuse_gd_forward=False)
    mesh = create_mesh()
    state, step_fn = make_everything(cfg)
    state = place_state(state, mesh)
    g0 = jax.tree_util.tree_map(np.asarray, state.gen_params)
    state, m = step_fn(state, device_batch(cfg, mesh, seed=0))
    assert np.isfinite(float(m["loss_gen_total"]))
    assert np.isfinite(float(m["loss_dis_all"]))
    assert _leaf_delta(state.gen_params, g0) > 0
