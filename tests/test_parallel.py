"""Mesh/sharding layer tests on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from dwcgan_tpu.config import config_from_dict
from dwcgan_tpu.data.pipeline import Batch, shard_batch, synthetic_batch
from dwcgan_tpu.parallel.mesh import (
    create_mesh, param_shardings, place_state, replicate, shard_spec,
)
from dwcgan_tpu.train.state import create_train_state


def _cfg():
    return config_from_dict({
        "batch_size": 8, "image_size": 32, "crop_size": 40,
        "compute_dtype": "float32",
        "gen": {"dim": 8, "mlp_dim": 16, "style_downsample": 3,
                "content_downsample": 2, "n_res": 2, "embed_dim": 12,
                "hidden_size": 12, "num_layers": 2},
        "dis": {"dim": 8, "n_layer": 3, "num_scales": 2, "image_size": 32},
    })


def test_create_mesh_shapes():
    m = create_mesh()
    assert dict(m.shape) == {"data": 8, "model": 1}
    m2 = create_mesh(data=4, model=2)
    assert dict(m2.shape) == {"data": 4, "model": 2}


def test_shard_batch_places_on_data_axis():
    mesh = create_mesh()
    b = synthetic_batch(8, 32)
    db = shard_batch(Batch(*(np.asarray(x) for x in b)), mesh)
    assert db.image.sharding.spec == P("data", None, None, None)
    assert db.txt.sharding.spec == P("data", None)
    # row content preserved
    np.testing.assert_array_equal(np.asarray(db.src_label), b.src_label)


def test_param_shardings_tp_rules():
    cfg = _cfg()
    state = create_train_state(cfg, jax.random.PRNGKey(0), 102)
    mesh = create_mesh(data=4, model=2)
    sh = param_shardings(mesh, state.gen_params, use_tp=True)
    # the style MLP's first two Dense kernels carry model-axis shardings
    mlp = sh["mlp"]
    specs = [s.spec for s in jax.tree_util.tree_leaves(mlp)]
    assert any("model" in str(s) for s in specs), specs
    # TxtEncoder coverage (round 4): the wide Gaussian heads shard their
    # contracting dim and the LSTM gate kernels shard the fused-gate dim
    flat = {"/".join(str(getattr(k, "key", k)) for k in p): s.spec
            for p, s in jax.tree_util.tree_flatten_with_path(sh)[0]}
    txt_sharded = [k for k, s in flat.items()
                   if k.startswith("enc_txt") and "model" in str(s)]
    assert any("head_mu/kernel" in k for k in txt_sharded), flat.keys()
    assert any("w_x" in k for k in txt_sharded), txt_sharded
    # everything on a 1-wide model axis stays replicated
    mesh1 = create_mesh(data=8, model=1)
    sh1 = param_shardings(mesh1, state.gen_params, use_tp=True)
    assert all(s.spec == P() for s in jax.tree_util.tree_leaves(sh1))


def test_place_state_opt_state_follows_params():
    cfg = _cfg()
    state = create_train_state(cfg, jax.random.PRNGKey(0), 102)
    mesh = create_mesh(data=4, model=2)
    placed = place_state(state, mesh, use_tp=True)
    # adam mu for a TP-sharded param has the same sharding as the param
    p_sh = placed.gen_params["mlp"]["LinearBlock_0"]["Dense_0"]["kernel"].sharding
    mu_sh = placed.gen_opt_state[1].mu["mlp"]["LinearBlock_0"]["Dense_0"]["kernel"].sharding
    assert p_sh == mu_sh
    assert int(placed.step) == 0


def test_replicate():
    mesh = create_mesh()
    tree = {"a": np.ones((4, 4)), "b": np.zeros((3,))}
    r = replicate(tree, mesh)
    assert r["a"].sharding.spec == P()
