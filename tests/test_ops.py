"""Ops-layer tests, using torch CPU as a numerical oracle where the reference
semantics are torch-defined (instance norm, AdaIN-as-batch-norm, the custom
LayerNorm, conv blocks, bilinear resize, packed-sequence LSTM)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from dwcgan_tpu.ops.blocks import Conv2dBlock, LinearBlock, MLP, AdaINResBlocks, make_initializer
from dwcgan_tpu.ops.lstm import MaskedBiLSTM, reverse_padded
from dwcgan_tpu.ops.norms import adain, instance_norm, layer_norm_ref
from dwcgan_tpu.ops.resize import downsample2x, upsample2x


def _nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2)


def _nhwc(x_nchw):
    return x_nchw.permute(0, 2, 3, 1).numpy()


def test_instance_norm_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 8, 8, 5)).astype(np.float32)
    got = np.asarray(instance_norm(jnp.asarray(x)))
    want = _nhwc(F.instance_norm(_nchw(x), eps=1e-5))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_adain_matches_reference_batchnorm_trick():
    """Reference AdaIN = reshaped F.batch_norm with dynamic weight/bias
    (networks.py:706-719)."""
    rng = np.random.default_rng(1)
    N, H, W, C = 2, 6, 6, 4
    x = rng.normal(size=(N, H, W, C)).astype(np.float32)
    scale = rng.normal(size=(N, C)).astype(np.float32)
    bias = rng.normal(size=(N, C)).astype(np.float32)

    got = np.asarray(adain(jnp.asarray(x), jnp.asarray(scale), jnp.asarray(bias)))

    xt = _nchw(x)
    x_reshaped = xt.contiguous().view(1, N * C, H, W)
    out = F.batch_norm(
        x_reshaped, torch.zeros(N * C), torch.ones(N * C),
        torch.from_numpy(scale).reshape(-1), torch.from_numpy(bias).reshape(-1),
        True, 0.1, 1e-5)
    want = _nhwc(out.view(N, C, H, W))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_layer_norm_ref_matches_torch_reference():
    """Custom LayerNorm: per-sample stats over all dims, unbiased std,
    divide by (std + eps), per-channel affine (networks.py:736-752)."""
    rng = np.random.default_rng(2)
    N, H, W, C = 3, 5, 5, 6
    x = rng.normal(size=(N, H, W, C)).astype(np.float32)
    gamma = rng.uniform(size=(C,)).astype(np.float32)
    beta = rng.normal(size=(C,)).astype(np.float32)

    got = np.asarray(layer_norm_ref(jnp.asarray(x), jnp.asarray(gamma), jnp.asarray(beta)))

    xt = _nchw(x).contiguous()
    mean = xt.view(N, -1).mean(1).view(N, 1, 1, 1)
    std = xt.view(N, -1).std(1).view(N, 1, 1, 1)
    y = (xt - mean) / (std + 1e-5)
    y = y * torch.from_numpy(gamma).view(1, -1, 1, 1) + torch.from_numpy(beta).view(1, -1, 1, 1)
    np.testing.assert_allclose(got, _nhwc(y), atol=1e-5)


@pytest.mark.parametrize("pad_type,torch_mode", [("reflect", "reflect"),
                                                 ("replicate", "replicate"),
                                                 ("zero", "constant")])
def test_conv2dblock_matches_torch(pad_type, torch_mode):
    """Same weights => same outputs (catches layout/transpose/pad bugs)."""
    rng = np.random.default_rng(3)
    N, H, W, Cin, Cout, K, S, P = 2, 16, 16, 3, 8, 4, 2, 1
    x = rng.normal(size=(N, H, W, Cin)).astype(np.float32)

    blk = Conv2dBlock(Cout, K, S, P, norm="none", activ="lrelu", pad_type=pad_type)
    params = blk.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(blk.apply(params, jnp.asarray(x)))

    w_hwio = np.asarray(params["params"]["Conv_0"]["kernel"])  # [K,K,I,O]
    b = np.asarray(params["params"]["Conv_0"]["bias"])
    w_oihw = torch.from_numpy(w_hwio.transpose(3, 2, 0, 1))
    xt = F.pad(_nchw(x), (P, P, P, P), mode=torch_mode)
    out = F.conv2d(xt, w_oihw, torch.from_numpy(b), stride=S)
    out = F.leaky_relu(out, 0.1)
    np.testing.assert_allclose(got, _nhwc(out), atol=1e-4)


def test_upsample2x_matches_torch_bilinear():
    rng = np.random.default_rng(4)
    x = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    got = np.asarray(upsample2x(jnp.asarray(x)))
    want = _nhwc(F.interpolate(_nchw(x), scale_factor=2, mode="bilinear",
                               align_corners=False))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_downsample2x_matches_torch_half_bilinear():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 16, 16, 3)).astype(np.float32)
    got = np.asarray(downsample2x(jnp.asarray(x)))
    want = _nhwc(F.interpolate(_nchw(x), scale_factor=0.5, mode="bilinear",
                               align_corners=False))
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_reverse_padded():
    x = jnp.asarray(np.arange(2 * 5 * 1, dtype=np.float32).reshape(2, 5, 1))
    lens = jnp.asarray([3, 5])
    r = np.asarray(reverse_padded(x, lens))
    np.testing.assert_array_equal(r[0, :, 0], [2, 1, 0, 0, 0])
    np.testing.assert_array_equal(r[1, :, 0], [9, 8, 7, 6, 5])


def _copy_lstm_params_to_torch(params, lstm_t, num_layers):
    """Copy flax MaskedBiLSTM weights (fused or unfused layout) into a torch
    bidirectional nn.LSTM."""
    sd = {}
    for layer in range(num_layers):
        for d, suf in ((0, ""), (1, "_reverse")):
            dname = "fwd" if d == 0 else "bwd"
            p = params["params"].get(f"l{layer}_{dname}")
            if p is None:  # fused layout: l{layer}/{dname}_w_x etc.
                fp = params["params"][f"l{layer}"]
                p = {"w_x": fp[f"{dname}_w_x"], "w_h": fp[f"{dname}_w_h"],
                     "b": fp[f"{dname}_b"]}
            sd[f"weight_ih_l{layer}{suf}"] = torch.from_numpy(np.asarray(p["w_x"]).T.copy())
            sd[f"weight_hh_l{layer}{suf}"] = torch.from_numpy(np.asarray(p["w_h"]).T.copy())
            sd[f"bias_ih_l{layer}{suf}"] = torch.from_numpy(np.asarray(p["b"]).copy())
            sd[f"bias_hh_l{layer}{suf}"] = torch.zeros_like(sd[f"bias_ih_l{layer}{suf}"])
    lstm_t.load_state_dict(sd)


@pytest.mark.parametrize("fuse", [True, False])
def test_masked_bilstm_matches_torch_packed(fuse):
    """Masked-scan bi-LSTM == torch packed-sequence bi-LSTM with the same
    weights (replaces networks_v2.py:213-249 sort/pack machinery), in both
    the direction-fused and unfused layouts."""
    B, T, D, H, L = 4, 9, 6, 5, 2
    rng = np.random.default_rng(6)
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    lens = np.array([9, 4, 1, 7], dtype=np.int32)

    model = MaskedBiLSTM(hidden=H, num_layers=L, dropout=0.0, fuse_directions=fuse)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(lens))
    outs, h_fin, c_fin = model.apply(params, jnp.asarray(x), jnp.asarray(lens))

    lstm_t = torch.nn.LSTM(D, H, num_layers=L, bidirectional=True)
    _copy_lstm_params_to_torch(params, lstm_t, L)
    xt = torch.from_numpy(x).transpose(0, 1)  # [T, B, D]
    order = np.argsort(-lens)
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        xt[:, order], lens[order].tolist())
    packed_out, (h_t, c_t) = lstm_t(packed)
    out_t, _ = torch.nn.utils.rnn.pad_packed_sequence(packed_out, total_length=T)
    inv = np.argsort(order)
    out_t = out_t[:, inv].transpose(0, 1).detach().numpy()  # [B, T, 2H]
    # torch final states: [L*2, B, H] ordered (l0f, l0b, l1f, l1b)
    h_t = h_t.view(L, 2, B, H)[:, :, inv].detach().numpy()
    c_t = c_t.view(L, 2, B, H)[:, :, inv].detach().numpy()

    np.testing.assert_allclose(np.asarray(outs), out_t, atol=1e-5)
    np.testing.assert_allclose(np.asarray(h_fin), h_t, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_fin), c_t, atol=1e-5)


def test_adain_resblocks_shapes_and_identity_start():
    rng = np.random.default_rng(7)
    N, H, W, C, NB = 2, 8, 8, 16, 3
    x = rng.normal(size=(N, H, W, C)).astype(np.float32)
    sp = rng.normal(size=(N, NB, 2, 2, C)).astype(np.float32)
    m = AdaINResBlocks(num_blocks=NB, dim=C)
    params = m.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(sp))
    y = m.apply(params, jnp.asarray(x), jnp.asarray(sp))
    assert y.shape == x.shape


def test_mlp_shapes():
    m = MLP(out_dim=4096, dim=256, n_blk=3)
    x = jnp.zeros((2, 64))
    params = m.init(jax.random.PRNGKey(0), x)
    assert m.apply(params, x).shape == (2, 4096)
    # 3 blocks: 64->256, 256->256, 256->4096 (networks.py:491-499)
    assert len(params["params"]) == 3


def test_initializers():
    k = jax.random.PRNGKey(0)
    w = make_initializer("gaussian")(k, (1000, 50), jnp.float32)
    assert abs(np.std(np.asarray(w)) - 0.02) < 0.002
    w = make_initializer("kaiming")(k, (3, 3, 16, 32), jnp.float32)
    # fan_in = 3*3*16 = 144; std = sqrt(2/144)
    assert abs(np.std(np.asarray(w)) - np.sqrt(2 / 144)) < 0.01


def test_linear_block_sn_stateless():
    """Stateless spectral norm: jit-pure, differentiable, and actually
    normalizes the top singular value to ~1."""
    m = LinearBlock(8, norm="sn", activ="none")
    x = jnp.eye(4, dtype=jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(variables, x)
    assert y.shape == (4, 8)
    # effective weight = rows of (y - bias); check top singular value
    b = np.asarray(variables["params"]["sn_bias"])
    w_eff = np.asarray(y) - b
    assert abs(np.linalg.svd(w_eff, compute_uv=False)[0] - 1.0) < 0.15
    g = jax.grad(lambda v: m.apply(v, x).sum())(variables)
    assert np.isfinite(np.asarray(jax.tree_util.tree_leaves(g)[0])).all()
