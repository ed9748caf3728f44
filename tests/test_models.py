"""Model tests: golden shapes + parameter-count parity against the torch
reference models instantiated from the reference YAML."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dwcgan_tpu.config import load_config
from dwcgan_tpu.models.discriminator import MsImageDis
from dwcgan_tpu.models.generator import Generator, build_embedding_matrix
from dwcgan_tpu.text.vocab import Vocab

CFG = load_config("/root/reference/configs/celeba_faces.yaml")
VOCAB = Vocab("CelebA")


@pytest.fixture(scope="module")
def gen_and_params():
    gen = Generator(cfg=CFG.gen, input_dim=3, vocab_size=VOCAB.size)
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), x)
    return gen, params


@pytest.fixture(scope="module")
def dis_and_params():
    dis = MsImageDis(cfg=CFG.dis)
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    params = dis.init(jax.random.PRNGKey(1), x)
    return dis, params


def test_generator_encode_shapes(gen_and_params):
    gen, params = gen_and_params
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    content, mu, logvar = gen.apply(params, x, method=Generator.encode)
    # content code 32x32x256 (SURVEY §2 dimensional facts)
    assert content.shape == (2, 32, 32, 256)
    assert mu.shape == (2, 8, 8) and logvar.shape == (2, 8, 8)


def test_generator_decode_shapes(gen_and_params):
    gen, params = gen_and_params
    content = jnp.zeros((2, 32, 32, 256), jnp.float32)
    style = jnp.zeros((2, 64), jnp.float32)
    img, att = gen.apply(params, content, style, method=Generator.decode)
    assert img.shape == (2, 128, 128, 3)
    assert att.shape == (2, 128, 128, 1)
    # heads bounded by tanh / sigmoid
    assert np.asarray(img).min() >= -1.0 and np.asarray(img).max() <= 1.0
    assert np.asarray(att).min() >= 0.0 and np.asarray(att).max() <= 1.0


def test_generator_encode_txt_shapes(gen_and_params):
    gen, params = gen_and_params
    style = jnp.zeros((2, 64), jnp.float32)
    tok = jnp.zeros((2, 82), jnp.int32)
    lens = jnp.asarray([5, 82], jnp.int32)
    mu, logvar = gen.apply(params, style, tok, lens, method=Generator.encode_txt)
    assert mu.shape == (2, 8, 8) and logvar.shape == (2, 8, 8)


def test_discriminator_shapes(dis_and_params):
    dis, params = dis_and_params
    x = jnp.zeros((2, 128, 128, 3), jnp.float32)
    outs = dis.apply(params, x)
    assert len(outs) == 2
    src0, cls0 = outs[0]
    src1, cls1 = outs[1]
    # 128 -> 5 stride-2 convs -> 4x4 patches; scale 1 runs at 64 -> 2x2
    assert src0.shape == (2, 4, 4, 1) and cls0.shape == (2, 8)
    assert src1.shape == (2, 2, 2, 1) and cls1.shape == (2, 8)
    # single-scale mode (used by R1/GP penalties, solver.py:341,348)
    outs1 = dis.apply(params, x, multiscale=False)
    assert len(outs1) == 1


def _count(tree):
    return sum(int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(tree))


@pytest.fixture(scope="module")
def reference_models():
    sys.path.insert(0, "/root/reference")
    try:
        from networks.networks import MsImageDis as TorchDis
        from networks.networks_v2 import AdaINGen_v2 as TorchGen
        from vocab import Vocab as TorchVocab
    finally:
        sys.path.remove("/root/reference")
    import yaml
    with open("/root/reference/configs/celeba_faces.yaml") as f:
        raw = yaml.safe_load(f)
    tgen = TorchGen(3, TorchVocab("CelebA"), raw["gen"])
    tdis = TorchDis(3, raw["dis"])
    return tgen, tdis


def test_generator_param_count_parity(gen_and_params, reference_models):
    """Same trainable capacity as the reference generator, modulo the one
    deliberate difference: torch LSTM carries redundant double biases
    (b_ih + b_hh); ours fuses them (num_layers * 2 dirs * 4H fewer params)."""
    _, params = gen_and_params
    tgen, _ = reference_models
    torch_n = sum(p.numel() for p in tgen.parameters())
    mine_n = _count(params)
    lstm_extra_bias = CFG.gen.num_layers * 2 * 4 * CFG.gen.hidden_size
    assert mine_n == torch_n - lstm_extra_bias, (mine_n, torch_n)


def test_discriminator_param_count_parity(dis_and_params, reference_models):
    _, params = dis_and_params
    _, tdis = reference_models
    torch_n = sum(p.numel() for p in tdis.parameters())
    assert _count(params) == torch_n


def test_build_embedding_matrix():
    table = build_embedding_matrix(VOCAB, 300, {"black": np.ones(300)}, seed=0)
    assert table.shape == (VOCAB.size, 300)
    np.testing.assert_array_equal(table[VOCAB.encode("black")], np.ones(300))
    # OOV rows drawn N(0, 0.6)
    assert 0.3 < table[VOCAB.encode("hair")].std() < 0.9


def test_generator_attention_can_be_disabled():
    import dataclasses
    cfg = dataclasses.replace(CFG.gen, use_attention=False)
    gen = Generator(cfg=cfg, input_dim=3, vocab_size=VOCAB.size)
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    params = gen.init(jax.random.PRNGKey(0), x)
    content = jnp.zeros((1, 32, 32, 256), jnp.float32)
    img, att = gen.apply(params, content, jnp.zeros((1, 64)), method=Generator.decode)
    assert att is None and img.shape == (1, 128, 128, 3)


def test_txt_encoder_length_invariance(gen_and_params):
    """Padding past each sequence's length must not change the output."""
    gen, params = gen_and_params
    style = jnp.asarray(np.random.default_rng(0).normal(size=(1, 64)), jnp.float32)
    rng = np.random.default_rng(1)
    toks = rng.integers(4, 100, size=(1, 82)).astype(np.int32)
    short = toks.copy()
    short[0, 10:] = 0  # PAD
    lens = jnp.asarray([10], jnp.int32)
    mu_a, _ = gen.apply(params, style, jnp.asarray(toks), lens, method=Generator.encode_txt)
    mu_b, _ = gen.apply(params, style, jnp.asarray(short), lens, method=Generator.encode_txt)
    np.testing.assert_allclose(np.asarray(mu_a), np.asarray(mu_b), atol=1e-6)
