"""Legacy (v1) model family.

The reference keeps a superseded v1 generation of models
(`/root/reference/networks/networks.py:177-425`, SURVEY §2 C23): a
single-style-head AdaIN generator, its StyleEncoder/TxtEncoder variants, an
uncapped content encoder, and a reduced VAE generator.  Provided here for
capability parity — new work should use `dwcgan_tpu.models.generator`.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dwcgan_tpu.models.generator import Decoder, TxtEncoder
from dwcgan_tpu.ops.blocks import Conv2dBlock, MLP, ResBlocks


class StyleEncoderV1(nn.Module):
    """Single Gaussian head over the pooled features
    (reference StyleEncoder v1, networks.py:371-406)."""

    dim: int = 64
    n_downsample: int = 5
    style_dim: int = 8
    activ: str = "relu"
    pad_type: str = "reflect"
    use_map: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        kw = dict(norm="none", activ=self.activ, pad_type=self.pad_type,
                  dtype=self.dtype)
        d = self.dim
        x = Conv2dBlock(d, 7, 1, 3, **kw)(x)
        for _ in range(2):
            x = Conv2dBlock(2 * d, 4, 2, 1, **kw)(x)
            d *= 2
        for _ in range(self.n_downsample - 2):
            x = Conv2dBlock(d, 4, 2, 1, **kw)(x)
        feats = jnp.mean(x, axis=(1, 2))
        if self.use_map:
            feats = nn.relu(nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32)(feats))
            feats = nn.Dropout(0.1)(feats, deterministic=deterministic)
            feats = nn.relu(nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32)(feats))
        mu = nn.Dense(self.style_dim, dtype=self.dtype, param_dtype=jnp.float32,
                      name="fc")(feats)
        logvar = nn.Dense(self.style_dim, dtype=self.dtype, param_dtype=jnp.float32,
                          name="fcVar")(feats)
        return mu, logvar


class TxtEncoderV1(nn.Module):
    """Single-head text encoder (networks.py:291-368) — the v2 module with
    num_cls=1 and c_dim=style_dim is the same computation."""

    vocab_size: int
    style_dim: int = 8
    embed_dim: int = 300
    hidden_size: int = 300
    num_layers: int = 2
    dropout_in: float = 0.1
    dropout_out: float = 0.1
    dtype: jnp.dtype = jnp.float32
    embed_init_table: Optional[np.ndarray] = None

    @nn.compact
    def __call__(self, style_ord, tokens, lengths, deterministic: bool = True):
        mu, logvar = TxtEncoder(
            vocab_size=self.vocab_size, embed_dim=self.embed_dim,
            hidden_size=self.hidden_size, c_dim=self.style_dim, num_cls=1,
            num_layers=self.num_layers, dropout_in=self.dropout_in,
            dropout_out=self.dropout_out, dtype=self.dtype,
            embed_init_table=self.embed_init_table, name="inner")(
            style_ord, tokens, lengths, deterministic=deterministic)
        return mu[:, 0], logvar[:, 0]


class ContentEncoderOld(nn.Module):
    """Uncapped content encoder: dim doubles every downsample
    (networks.py:409-425)."""

    dim: int = 64
    n_downsample: int = 2
    n_res: int = 4
    activ: str = "relu"
    pad_type: str = "reflect"
    dtype: jnp.dtype = jnp.float32

    @property
    def output_dim(self) -> int:
        return self.dim * (2 ** self.n_downsample)

    @nn.compact
    def __call__(self, x):
        kw = dict(activ=self.activ, pad_type=self.pad_type, dtype=self.dtype)
        d = self.dim
        x = Conv2dBlock(d, 7, 1, 3, norm="in", **kw)(x)
        for _ in range(self.n_downsample):
            x = Conv2dBlock(d * 2, 4, 2, 1, norm="in", **kw)(x)
            d *= 2
        return ResBlocks(self.n_res, d, norm="in", **kw)(x)


class AdaINGenV1(nn.Module):
    """v1 AdaIN generator: one global style vector, uncapped content encoder
    (networks.py:177-253)."""

    input_dim: int = 3
    vocab_size: int = 102
    dim: int = 64
    style_dim: int = 8
    n_downsample: int = 2
    n_res: int = 4
    activ: str = "relu"
    pad_type: str = "reflect"
    mlp_dim: int = 256
    use_attention: bool = True
    use_map: bool = True
    embed_dim: int = 300
    hidden_size: int = 300
    num_layers: int = 2
    dtype: jnp.dtype = jnp.float32
    embed_init_table: Optional[np.ndarray] = None

    def setup(self):
        self.enc_style = StyleEncoderV1(
            dim=self.dim, n_downsample=5, style_dim=self.style_dim,
            activ=self.activ, pad_type=self.pad_type, use_map=self.use_map,
            dtype=self.dtype)
        self.enc_content = ContentEncoderOld(
            dim=self.dim, n_downsample=self.n_downsample, n_res=self.n_res,
            activ=self.activ, pad_type=self.pad_type, dtype=self.dtype)
        content_dim = self.enc_content.output_dim
        self.dec = Decoder(dim=content_dim, out_dim=self.input_dim,
                           n_upsample=self.n_downsample, n_res=self.n_res,
                           activ=self.activ, pad_type=self.pad_type,
                           use_attention=self.use_attention, dtype=self.dtype)
        self.enc_txt = TxtEncoderV1(
            vocab_size=self.vocab_size, style_dim=self.style_dim,
            embed_dim=self.embed_dim, hidden_size=self.hidden_size,
            num_layers=self.num_layers, dtype=self.dtype,
            embed_init_table=self.embed_init_table)
        self.mlp = MLP(out_dim=self.dec.num_adain_params, dim=self.mlp_dim,
                       n_blk=3, norm="none", activ=self.activ, dtype=self.dtype)

    def encode(self, images, deterministic: bool = True):
        mu, logvar = self.enc_style(images, deterministic=deterministic)
        return self.enc_content(images), mu, logvar

    def encode_txt(self, style_ord, tokens, lengths, deterministic: bool = True):
        return self.enc_txt(style_ord, tokens, lengths, deterministic=deterministic)

    def decode(self, content, style):
        return self.dec(content, self.mlp(style))

    def __call__(self, images, deterministic: bool = True):
        content, mu, _ = self.encode(images, deterministic=deterministic)
        img, att = self.decode(content, mu)
        tok = jnp.zeros((images.shape[0], 4), jnp.int32)
        lens = jnp.full((images.shape[0],), 4, jnp.int32)
        self.encode_txt(mu, tok, lens, deterministic=deterministic)
        return img, att


class VAEGen(nn.Module):
    """Reduced VAE generator (networks.py:255-286): encoder hiddens are the
    Gaussian means with unit variance; training adds unit noise."""

    input_dim: int = 3
    dim: int = 64
    n_downsample: int = 2
    n_res: int = 4
    activ: str = "relu"
    pad_type: str = "reflect"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        from dwcgan_tpu.models.generator import ContentEncoder
        self.enc = ContentEncoder(dim=self.dim, n_downsample=self.n_downsample,
                                  n_res=self.n_res, activ=self.activ,
                                  pad_type=self.pad_type, dtype=self.dtype)
        self.dec = Decoder(dim=self.enc.output_dim, out_dim=self.input_dim,
                           n_upsample=self.n_downsample, n_res=self.n_res,
                           activ=self.activ, pad_type=self.pad_type,
                           use_attention=False, dtype=self.dtype)

    def encode(self, images):
        return self.enc(images)

    def decode(self, hiddens):
        # the v1 decoder is AdaIN-parameterized; VAEGen drives it with a
        # zero style (scale 1 via +1 shift is NOT applied — parity with 'in'
        # norm is approximated by unit scale / zero bias)
        n = hiddens.shape[0]
        params = jnp.zeros((n, self.dec.num_adain_params), self.dtype)
        # scale slots get 1.0: layout [n_res, 2, 2(bias, scale), dim]
        p = params.reshape(n, self.dec.n_res, 2, 2, self.dec.dim)
        p = p.at[:, :, :, 1, :].set(1.0)
        img, _ = self.dec(hiddens, p.reshape(n, -1))
        return img

    def __call__(self, images, key=None, deterministic: bool = True):
        hiddens = self.encode(images)
        if not deterministic and key is not None:
            hiddens = hiddens + jax.random.normal(key, hiddens.shape, hiddens.dtype)
        return self.decode(hiddens), hiddens
