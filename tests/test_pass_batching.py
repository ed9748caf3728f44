"""Pass-batching exactness (train/step.py's core assumption).

The fused step runs G's four same-content decodes as ONE decoder pass at
4n and the three re-encodes as one 3n encoder pass.  That is only valid if
every op in the generator/discriminator is strictly per-sample — no
batch-coupled statistics.  This test pins the assumption at the model
level: batched-concat outputs must equal per-item outputs (same params,
deterministic mode) to float32 round-off — XLA may tile a conv differently
at 2n vs 8n, so the comparison allows last-ulp noise but nothing more —
for encode, decode, and the discriminator.
"""

import jax
import jax.numpy as jnp
import numpy as np

from dwcgan_tpu.config import config_from_dict
from dwcgan_tpu.train.state import build_models, create_train_state


def assert_close(a, b):
    # observed cross-batch-size conv tiling noise: <=1.1e-6 absolute on a
    # handful of elements; genuine batch coupling (e.g. batch-norm-style
    # stats) would differ at the 1e-1 scale
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=5e-6)


def _cfg():
    return config_from_dict({
        "batch_size": 2, "image_size": 32, "crop_size": 40,
        "compute_dtype": "float32",
        "gen": {"dim": 8, "mlp_dim": 16, "style_downsample": 3,
                "content_downsample": 2, "n_res": 2, "embed_dim": 12,
                "hidden_size": 12, "num_layers": 2},
        "dis": {"dim": 8, "n_layer": 3, "num_scales": 2, "image_size": 32},
    })


def test_decoder_batching_is_exact():
    cfg = _cfg()
    state = create_train_state(cfg, jax.random.PRNGKey(0), 102)
    gen, _ = build_models(cfg, 102)
    p = {"params": state.gen_params}

    rng = np.random.default_rng(0)
    content = jnp.asarray(rng.normal(size=(2, 8, 8, 32)).astype(np.float32))
    styles = [jnp.asarray(rng.normal(size=(2, 64)).astype(np.float32))
              for _ in range(4)]

    # four separate decodes
    sep = [gen.apply(p, content, s, method="decode") for s in styles]
    # one batched decode at 4n
    img_b, att_b = gen.apply(p, jnp.tile(content, (4, 1, 1, 1)),
                             jnp.concatenate(styles, 0), method="decode")
    for i, (img_s, att_s) in enumerate(sep):
        assert_close(np.asarray(img_b[2 * i:2 * i + 2]),
                                      np.asarray(img_s))
        assert_close(np.asarray(att_b[2 * i:2 * i + 2]),
                                      np.asarray(att_s))


def test_encoder_batching_is_exact():
    cfg = _cfg()
    state = create_train_state(cfg, jax.random.PRNGKey(0), 102)
    gen, _ = build_models(cfg, 102)
    p = {"params": state.gen_params}

    rng = np.random.default_rng(1)
    xs = [jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
          for _ in range(3)]
    sep = [gen.apply(p, x, method="encode") for x in xs]
    c_b, mu_b, lv_b = gen.apply(p, jnp.concatenate(xs, 0), method="encode")
    for i, (c_s, mu_s, lv_s) in enumerate(sep):
        assert_close(np.asarray(c_b[2 * i:2 * i + 2]),
                                      np.asarray(c_s))
        assert_close(np.asarray(mu_b[2 * i:2 * i + 2]),
                                      np.asarray(mu_s))
        assert_close(np.asarray(lv_b[2 * i:2 * i + 2]),
                                      np.asarray(lv_s))


def test_discriminator_batching_is_exact():
    cfg = _cfg()
    state = create_train_state(cfg, jax.random.PRNGKey(0), 102)
    _, dis = build_models(cfg, 102)
    p = {"params": state.dis_params}

    rng = np.random.default_rng(2)
    xs = [jnp.asarray(rng.uniform(-1, 1, (2, 32, 32, 3)).astype(np.float32))
          for _ in range(3)]
    sep = [dis.apply(p, x) for x in xs]
    outs_b = dis.apply(p, jnp.concatenate(xs, 0))
    for scale, (src_b, cls_b) in enumerate(outs_b):
        for i in range(3):
            assert_close(
                np.asarray(src_b[2 * i:2 * i + 2]), np.asarray(sep[i][scale][0]))
            assert_close(
                np.asarray(cls_b[2 * i:2 * i + 2]), np.asarray(sep[i][scale][1]))


def test_bn_rejected_by_fused_step():
    """'bn' computes batch-axis statistics, which pass batching would mix
    across real/fake samples in the 3n discriminator pass — make_train_step
    must reject it loudly (ADVICE r2)."""
    import pytest

    from dwcgan_tpu.train.state import make_optimizer
    from dwcgan_tpu.train.step import make_train_step

    cfg = _cfg()
    cfg.dis.norm = "bn"
    state = create_train_state(cfg, jax.random.PRNGKey(0), 102)
    gen, dis = build_models(cfg, 102)
    tx = make_optimizer(cfg, state.gen_params)
    with pytest.raises(ValueError, match="bn"):
        make_train_step(cfg, gen, dis, tx, tx)
