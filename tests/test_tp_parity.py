"""Tensor-parallel numerical parity (VERDICT r1 weak #5).

The TP rules in parallel/mesh.py shard the style-MLP and deep-D-conv kernels
over the model axis.  Sharding must not change the math: one fused train
step from identical init and batch must produce (numerically) the same
losses and the same updated parameters on dp8 (no TP) and dp4 x tp2.
Differences come only from reduction order, so fp32 tolerances are tight.
"""

import jax
import numpy as np
import pytest

from dwcgan_tpu.config import config_from_dict
from dwcgan_tpu.data.pipeline import Batch, synthetic_batch, shard_batch
from dwcgan_tpu.parallel.mesh import create_mesh, place_state
from dwcgan_tpu.train.state import build_models, create_train_state, make_optimizer
from dwcgan_tpu.train.step import make_train_step


def _cfg():
    return config_from_dict({
        "batch_size": 8, "image_size": 32, "crop_size": 40,
        "compute_dtype": "float32",
        # mlp_dim 16 -> LinearBlock_1 kernel is 16-wide: divisible by tp=2,
        # so the TP rules genuinely engage (param_shardings checks
        # divisibility before sharding)
        "gen": {"dim": 8, "mlp_dim": 16, "style_downsample": 3,
                "content_downsample": 2, "n_res": 2, "embed_dim": 12,
                "hidden_size": 12, "num_layers": 2},
        "dis": {"dim": 8, "n_layer": 3, "num_scales": 2, "image_size": 32},
    })


def _one_step(mesh, use_tp):
    cfg = _cfg()
    state = create_train_state(cfg, jax.random.PRNGKey(11), vocab_size=102)
    state = place_state(state, mesh, use_tp=use_tp)
    gen, dis = build_models(cfg, 102)
    gen_tx = make_optimizer(cfg, state.gen_params)
    dis_tx = make_optimizer(cfg, state.dis_params)
    step_fn = jax.jit(make_train_step(cfg, gen, dis, gen_tx, dis_tx),
                      donate_argnums=0)
    b = synthetic_batch(cfg.batch_size, cfg.image_size, seed=5)
    batch = shard_batch(Batch(*(np.asarray(x) for x in b)), mesh)
    state, metrics = step_fn(state, batch)
    return state, {k: float(v) for k, v in metrics.items()}


@pytest.mark.slow
def test_tp_matches_dp_only():
    state_dp, m_dp = _one_step(create_mesh(data=8, model=1), use_tp=False)
    state_tp, m_tp = _one_step(create_mesh(data=4, model=2), use_tp=True)

    # the TP run actually sharded something over the model axis
    tp_specs = [str(l.sharding.spec)
                for l in jax.tree_util.tree_leaves(state_tp.gen_params)]
    assert any("model" in s for s in tp_specs), "TP rules matched nothing"

    for k in m_dp:
        np.testing.assert_allclose(m_tp[k], m_dp[k], rtol=2e-4, atol=1e-5,
                                   err_msg=f"metric {k} diverged under TP")

    # updated generator params agree leaf-by-leaf.  atol: at step 1 Adam's
    # update is lr*g/sqrt(g^2) = +-lr exactly, so a reduction-order-induced
    # sign flip of a near-zero gradient component legally moves a param by
    # 2*lr = 2e-4; anything beyond that indicates real TP breakage (the
    # tight metric assertions above already pin forward/loss parity).
    for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_leaves_with_path(state_dp.gen_params),
            jax.tree_util.tree_leaves_with_path(state_tp.gen_params)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2.5e-4,
            err_msg=f"param {jax.tree_util.keystr(pa)} diverged under TP")
