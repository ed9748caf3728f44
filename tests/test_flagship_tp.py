"""Flagship-size graph under tensor parallelism (VERDICT r3 stretch #9).

`dryrun_multichip` jits the full training step over a dp x tp mesh on 16px
toy shapes (kept tiny for compile time on this 1-core host) — so until now
the FLAGSHIP graph (128px, dim 64, mlp_dim 256) had never been jitted at
mesh_model=2; only the toy graph had.  This slow test compiles the
flagship fused step on a 4-device virtual CPU mesh as dp2 x tp2 and runs
ONE step: compile must succeed, the TP rules must engage on the real
flagship shapes (mlp_dim 256 % 2 == 0), and the losses must be finite.

Numerical dp-vs-tp parity at tiny scale is pinned by test_tp_parity.py;
this test is about shape/sharding composition at full size, so it runs one
topology and checks health, not cross-topology equality (a second flagship
compile would double an already multi-minute test).
"""

import jax
import numpy as np
import pytest

from dwcgan_tpu.config import load_config
from dwcgan_tpu.data.pipeline import Batch, synthetic_batch, shard_batch
from dwcgan_tpu.parallel.mesh import create_mesh, place_state, param_shardings
from dwcgan_tpu.train.state import build_models, create_train_state, make_optimizer
from dwcgan_tpu.train.step import make_train_step


@pytest.mark.slow
def test_flagship_step_compiles_at_tp2():
    if len(jax.devices()) < 4:
        pytest.skip("needs 4 virtual devices")
    cfg = load_config("configs/celeba_faces.yaml")
    cfg.batch_size = 4          # smallest batch that shards over dp=2
    cfg.attr_path = "/nonexistent"
    cfg.vgg_w = 0.0             # keep the CPU compile bounded
    cfg.compute_dtype = "float32"

    mesh = create_mesh(data=2, model=2)
    state = create_train_state(cfg, jax.random.PRNGKey(0), vocab_size=102)

    # the TP rules must actually engage on flagship shapes
    shardings = param_shardings(mesh, state.gen_params)
    specs = {str(k): s.spec for k, s in
             jax.tree_util.tree_flatten_with_path(shardings)[0]}
    sharded = [k for k, s in specs.items()
               if any(ax == "model" for ax in s)]
    assert sharded, "no parameter picked up a model-axis sharding"

    state = place_state(state, mesh, use_tp=True)
    gen, dis = build_models(cfg, 102)
    gen_tx = make_optimizer(cfg, state.gen_params)
    dis_tx = make_optimizer(cfg, state.dis_params)
    step_fn = jax.jit(make_train_step(cfg, gen, dis, gen_tx, dis_tx),
                      donate_argnums=0)
    b = synthetic_batch(cfg.batch_size, cfg.image_size, seed=3)
    batch = shard_batch(Batch(*(np.asarray(x) for x in b)), mesh)
    state, metrics = step_fn(state, batch)
    for k, v in metrics.items():
        assert np.isfinite(float(v)), (k, float(v))
