"""Behavioral equivalence against the torch reference models.

Builds the reference AdaINGen_v2 / MsImageDis (random init), imports their
weights through `dwcgan_tpu.interop`, and checks our generator and
discriminator produce the same outputs — the strongest possible parity
statement, and the test of the reference-checkpoint import path.
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import yaml

from dwcgan_tpu.config import load_config
from dwcgan_tpu.interop.torch_import import (
    convert_reference_discriminator, convert_reference_generator,
)
from dwcgan_tpu.models.discriminator import MsImageDis
from dwcgan_tpu.models.generator import Generator

CFG = load_config("/root/reference/configs/celeba_faces.yaml")


@pytest.fixture(scope="module")
def reference_pair():
    sys.path.insert(0, "/root/reference")
    try:
        from networks.networks import MsImageDis as TorchDis
        from networks.networks_v2 import AdaINGen_v2 as TorchGen
        from vocab import Vocab as TorchVocab
    finally:
        sys.path.remove("/root/reference")
    with open("/root/reference/configs/celeba_faces.yaml") as f:
        raw = yaml.safe_load(f)
    torch.manual_seed(0)
    tgen = TorchGen(3, TorchVocab("CelebA"), raw["gen"]).eval()
    tdis = TorchDis(3, raw["dis"]).eval()
    return tgen, tdis


def _nchw(x):
    return torch.from_numpy(np.asarray(x)).permute(0, 3, 1, 2)


def _nhwc(t):
    return t.detach().permute(0, 2, 3, 1).numpy()


def test_generator_equivalence(reference_pair):
    tgen, _ = reference_pair
    params = convert_reference_generator(tgen.state_dict(), CFG.gen,
                                         vocab_size=102)
    gen = Generator(cfg=CFG.gen, input_dim=3, vocab_size=102,
                    dtype=jnp.float32)

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32)

    # ---- encode ----
    content, mu, logvar = gen.apply(params, jnp.asarray(x),
                                    method=Generator.encode)
    with torch.no_grad():
        t_content = tgen.enc_content(_nchw(x))
        t_mus, t_logvars = tgen.enc_style(_nchw(x))
    np.testing.assert_allclose(np.asarray(content), _nhwc(t_content), atol=2e-4)
    t_mu = torch.stack(t_mus, dim=1).numpy()          # [N, K, C]
    t_lv = torch.stack(t_logvars, dim=1).numpy()
    np.testing.assert_allclose(np.asarray(mu), t_mu, atol=1e-4)
    np.testing.assert_allclose(np.asarray(logvar), t_lv, atol=1e-4)

    # ---- decode (AdaIN plumbing end-to-end) ----
    style = np.asarray(mu).reshape(2, -1)
    img, att = gen.apply(params, content, jnp.asarray(style),
                         method=Generator.decode)
    with torch.no_grad():
        t_img, t_att = tgen.decode(t_content, torch.from_numpy(style))
    np.testing.assert_allclose(np.asarray(img), _nhwc(t_img), atol=2e-3)
    np.testing.assert_allclose(np.asarray(att), _nhwc(t_att), atol=2e-3)

    # ---- encode_txt (batch 1: the reference head-concat is only
    # well-defined there, networks_v2.py:249) ----
    toks = rng.integers(4, 100, size=(1, 20)).astype(np.int64)
    lens = np.array([20], dtype=np.int64)
    mu_t, lv_t = gen.apply(params, jnp.asarray(style[:1]),
                           jnp.asarray(toks.astype(np.int32)),
                           jnp.asarray(lens.astype(np.int32)),
                           method=Generator.encode_txt)
    with torch.no_grad():
        t_mu_t, t_lv_t = tgen.encode_txt(torch.from_numpy(style[:1]),
                                         torch.from_numpy(toks),
                                         torch.from_numpy(lens))
    np.testing.assert_allclose(np.asarray(mu_t)[0],
                               torch.stack(t_mu_t, 1).numpy()[0], atol=1e-4)
    np.testing.assert_allclose(np.asarray(lv_t)[0],
                               torch.stack(t_lv_t, 1).numpy()[0], atol=1e-4)


def test_discriminator_equivalence(reference_pair):
    _, tdis = reference_pair
    params = convert_reference_discriminator(tdis.state_dict(), CFG.dis)
    dis = MsImageDis(cfg=CFG.dis, dtype=jnp.float32)

    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (2, 128, 128, 3)).astype(np.float32)
    outs = dis.apply(params, jnp.asarray(x))
    with torch.no_grad():
        t_outs = tdis(_nchw(x))
    for (src, cls), (t_src, t_cls) in zip(outs, t_outs):
        np.testing.assert_allclose(np.asarray(src), _nhwc(t_src), atol=2e-4)
        np.testing.assert_allclose(np.asarray(cls), t_cls.numpy(), atol=2e-4)
