"""Partial warm-start (reference init_network, solver.py:383-400)."""

import jax
import jax.numpy as jnp
import numpy as np

from dwcgan_tpu.config import config_from_dict
from dwcgan_tpu.train.checkpoint import CheckpointManager, warm_start
from dwcgan_tpu.train.state import create_train_state


def _cfg():
    return config_from_dict({
        "batch_size": 4, "image_size": 32, "crop_size": 40,
        "compute_dtype": "float32",
        "gen": {"dim": 8, "mlp_dim": 16, "style_downsample": 3,
                "content_downsample": 2, "n_res": 2, "embed_dim": 12,
                "hidden_size": 12, "num_layers": 2},
        "dis": {"dim": 8, "n_layer": 3, "num_scales": 2, "image_size": 32},
    })


def test_warm_start_copies_all_but_embedding(tmp_path):
    cfg = _cfg()
    donor = create_train_state(cfg, jax.random.PRNGKey(1), 102)
    mgr = CheckpointManager(str(tmp_path / "donor"))
    mgr.save(donor, wait=True)
    mgr.close()

    fresh = create_train_state(cfg, jax.random.PRNGKey(2), 102)
    fresh_emb = np.asarray(fresh.gen_params["enc_txt"]["embedding"])
    warmed = warm_start(fresh, str(tmp_path / "donor"))

    # embedding kept from the fresh init
    np.testing.assert_array_equal(
        np.asarray(warmed.gen_params["enc_txt"]["embedding"]), fresh_emb)
    # a conv kernel came from the donor
    donor_k = np.asarray(jax.tree_util.tree_leaves(donor.gen_params["enc_content"])[0])
    warmed_k = np.asarray(jax.tree_util.tree_leaves(warmed.gen_params["enc_content"])[0])
    np.testing.assert_array_equal(warmed_k, donor_k)
    # optimizer state stays fresh (step untouched)
    assert int(warmed.step) == 0
