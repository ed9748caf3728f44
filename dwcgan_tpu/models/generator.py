"""The DWC-GAN generator family, TPU-native.

Equivalent capability to the reference's `AdaINGen_v2`
(`/root/reference/networks/networks_v2.py:9-95`) with a functional design:

- styles are `[N, num_cls, c_dim]` tensors (the reference carries lists of 8
  per-attribute tensors; its per-attribute Linear heads on a shared input are
  mathematically one Dense of width num_cls*c_dim)
- AdaIN parameters flow MLP(style) -> [N, n_res, 2, 2, C] and are *passed*
  into the decoder (replacing the reference's assign-params module mutation,
  networks_v2.py:78-87)
- the text encoder is a masked-scan bi-LSTM (replacing sort+pack, :213-254)

Layout is NHWC; params fp32; compute dtype configurable (bfloat16 on TPU).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dwcgan_tpu.config import GenConfig
from dwcgan_tpu.ops.blocks import (
    AdaINResBlocks, Conv2dBlock, MLP, ResBlocks, _ConvKB, make_initializer,
    pad2d)
from dwcgan_tpu.ops.lstm import MaskedBiLSTM
from dwcgan_tpu.ops.resize import upsample2x


def build_embedding_matrix(vocab, embed_dim: int,
                           pretrained: Optional[Dict[str, np.ndarray]] = None,
                           seed: int = 0) -> np.ndarray:
    """Build the (optionally pretrained) word-embedding table.

    Mirrors networks_v2.py:186-194: pretrained fastText vectors where
    available, N(0, 0.6) rows for OOV words, zeros only if no pretrained dict
    at all (then the table trains from its own init instead).
    """
    rng = np.random.default_rng(seed)
    if pretrained is None:
        return rng.normal(0.0, 1.0, (vocab.size, embed_dim)).astype(np.float32)
    table = np.zeros((vocab.size, embed_dim), dtype=np.float32)
    for i, word in enumerate(vocab.itos):
        vec = pretrained.get(word)
        if vec is not None:
            table[i] = np.asarray(vec, dtype=np.float32)
        else:
            table[i] = rng.normal(scale=0.6, size=(embed_dim,))
    return table


class ContentEncoder(nn.Module):
    """7x7 stem + capped stride-2 downsamples + IN resblocks
    (reference `ContentEncoder`, networks.py:428-446; dim cap 256)."""

    dim: int = 64
    n_downsample: int = 2
    n_res: int = 4
    activ: str = "relu"
    pad_type: str = "reflect"
    dtype: jnp.dtype = jnp.float32
    kernel_init: callable = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
    use_pallas: bool = False
    parity: bool = False
    stem_pallas: bool = False   # fused Pallas 7x7 stem (ops/pallas/stem_kernels)

    @property
    def output_dim(self) -> int:
        d = self.dim
        for _ in range(self.n_downsample):
            d = min(d * 2, 256)
        return d

    @nn.compact
    def __call__(self, x):
        kw = dict(activ=self.activ, pad_type=self.pad_type, dtype=self.dtype,
                  kernel_init=self.kernel_init, use_pallas=self.use_pallas)
        d = self.dim
        x = Conv2dBlock(d, 7, 1, 3, norm="in", parity=self.parity,
                        stem_pallas=self.stem_pallas, **kw)(x)
        for _ in range(self.n_downsample):
            d = min(d * 2, 256)
            x = Conv2dBlock(d, 4, 2, 1, norm="in", **kw)(x)
        return ResBlocks(self.n_res, d, norm="in", **kw)(x)


class StyleEncoder(nn.Module):
    """Conv stack + GAP + mapping MLP + per-attribute Gaussian heads
    (reference StyleEncoder v2, networks_v2.py:98-141).

    Returns (mu, logvar), each [N, num_cls, c_dim].
    """

    dim: int = 64
    n_downsample: int = 5
    c_dim: int = 8
    num_cls: int = 8
    activ: str = "relu"
    pad_type: str = "reflect"
    use_map: bool = True
    dtype: jnp.dtype = jnp.float32
    kernel_init: callable = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
    parity: bool = False
    stem_pallas: bool = False

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        kw = dict(norm="none", activ=self.activ, pad_type=self.pad_type,
                  dtype=self.dtype, kernel_init=self.kernel_init)
        d = self.dim
        x = Conv2dBlock(d, 7, 1, 3, parity=self.parity,
                        stem_pallas=self.stem_pallas, **kw)(x)
        for _ in range(2):
            x = Conv2dBlock(2 * d, 4, 2, 1, **kw)(x)
            d *= 2
        for _ in range(self.n_downsample - 2):
            x = Conv2dBlock(d, 4, 2, 1, **kw)(x)
        feats = jnp.mean(x, axis=(1, 2))  # global average pool -> [N, d]

        if self.use_map:
            dense = lambda n: nn.Dense(d, dtype=self.dtype, param_dtype=jnp.float32,
                                       kernel_init=self.kernel_init, name=n)
            feats = nn.relu(dense("map_0")(feats))
            feats = nn.Dropout(0.1)(feats, deterministic=deterministic)
            feats = nn.relu(dense("map_1")(feats))

        # num_cls independent Linear(d, c_dim) heads == one Dense(num_cls*c_dim)
        out = self.num_cls * self.c_dim
        mu = nn.Dense(out, dtype=self.dtype, param_dtype=jnp.float32,
                      kernel_init=self.kernel_init, name="head_mu")(feats)
        logvar = nn.Dense(out, dtype=self.dtype, param_dtype=jnp.float32,
                          kernel_init=self.kernel_init, name="head_logvar")(feats)
        shape = (x.shape[0], self.num_cls, self.c_dim)
        return mu.reshape(shape), logvar.reshape(shape)


class TxtEncoder(nn.Module):
    """(current style, command tokens) -> target style distribution.

    Reference TxtEncoder v2 (networks_v2.py:171-254): frozen 300-d word
    embeddings; per-timestep input = embedding ++ current 64-d style; 2-layer
    bi-LSTM; heads read the concatenated final (h, c) of every layer and
    direction ([N, hidden*num_layers*4] = 2400).

    The reference's head-input reshape interleaves the batch when N > 1
    (torch.cat(dim=1).view(N, -1) at networks_v2.py:249 — harmless at its
    batch size of 1); here the concat is per-sample and well-defined.
    """

    vocab_size: int
    embed_dim: int = 300
    hidden_size: int = 300
    c_dim: int = 8
    num_cls: int = 8
    num_layers: int = 2
    dropout_in: float = 0.1
    dropout_out: float = 0.1
    dtype: jnp.dtype = jnp.float32
    kernel_init: callable = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
    embed_init_table: Optional[np.ndarray] = None  # pretrained table (frozen via optimizer mask)

    def setup(self):
        if self.embed_init_table is not None:
            table = self.embed_init_table
            embed_init = lambda *_: jnp.asarray(table, jnp.float32)
        else:
            embed_init = nn.initializers.normal(stddev=1.0)  # torch nn.Embedding default
        self.embedding = self.param("embedding", embed_init,
                                    (self.vocab_size, self.embed_dim), jnp.float32)
        self.drop_in = nn.Dropout(self.dropout_in)
        self.lstm = MaskedBiLSTM(self.hidden_size, self.num_layers,
                                 self.dropout_out, self.dtype)
        out = self.num_cls * self.c_dim
        self.head_mu = nn.Dense(out, dtype=self.dtype, param_dtype=jnp.float32,
                                kernel_init=self.kernel_init, name="head_mu")
        self.head_logvar = nn.Dense(out, dtype=self.dtype, param_dtype=jnp.float32,
                                    kernel_init=self.kernel_init,
                                    name="head_logvar")

    def _run(self, style_flat, x, lengths, deterministic):
        """Shared tail: dropout -> style concat -> bi-LSTM -> Gaussian heads."""
        x = self.drop_in(x, deterministic=deterministic)
        style_b = jnp.broadcast_to(style_flat[:, None, :].astype(self.dtype),
                                   (x.shape[0], x.shape[1], style_flat.shape[-1]))
        x = jnp.concatenate([x, style_b], axis=-1)
        _, h_fin, c_fin = self.lstm(x, lengths, deterministic=deterministic)
        # [L, 2, N, H] -> [N, L*2*H]; concat h then c -> [N, L*4*H]
        def flat(s):
            return jnp.transpose(s, (2, 0, 1, 3)).reshape(s.shape[2], -1)
        feats = jnp.concatenate([flat(h_fin), flat(c_fin)], axis=-1)
        shape = (feats.shape[0], self.num_cls, self.c_dim)
        return (self.head_mu(feats).reshape(shape),
                self.head_logvar(feats).reshape(shape))

    def __call__(self, style_flat, tokens, lengths, deterministic: bool = True):
        """style_flat: [N, num_cls*c_dim]; tokens: [N, T] int32; lengths: [N]."""
        x = jnp.take(self.embedding, tokens, axis=0).astype(self.dtype)  # [N, T, E]
        return self._run(style_flat, x, lengths, deterministic)

    def from_embeddings(self, style_flat, embeddings, lengths,
                        deterministic: bool = True):
        """Raw word-embedding input variant (reference `forward_embed`,
        networks_v2.py:257-293): bypasses the token lookup so callers can
        feed precomputed/externally-produced embeddings."""
        return self._run(style_flat, embeddings.astype(self.dtype), lengths,
                         deterministic)


class _ConvParams(nn.Module):
    """Parameter-compatible stand-in for a Conv2dBlock's inner nn.Conv:
    declares `Conv_0/{kernel,bias}` at the same tree path and just returns
    them, so callers can fuse several logical convs into one launch without
    changing the checkpoint/torch-import layout."""

    features: int
    kernel_size: int
    in_features: int
    kernel_init: callable

    @nn.compact
    def __call__(self):
        # shared kernel/bias stand-in from ops.blocks (ADVICE r3 dedupe);
        # the flax tree path is set by name="Conv_0", not the class
        return _ConvKB(self.features, self.kernel_size, self.in_features,
                       self.kernel_init, name="Conv_0")()


class Decoder(nn.Module):
    """AdaIN resblocks -> bilinear-upsample conv stages -> image + attention
    heads (reference Decoder, networks_v2.py:144-169).

    TPU note: with attention on, the two 7x7 heads (C_out=3 image, C_out=1
    attention — both MXU-hostile channel counts) are computed as ONE
    4-channel convolution from concatenated kernels; profiling showed the
    separate tiny-channel convs and their input/weight gradients costing
    ~15 ms/step at 2-11 TF/s (tools/profile_results.json).  The parameter
    tree is unchanged (`image_head/Conv_0`, `attention_head/Conv_0`)."""

    dim: int                      # input channels (content code dim)
    out_dim: int = 3
    n_upsample: int = 2
    n_res: int = 4
    activ: str = "relu"
    pad_type: str = "reflect"
    use_attention: bool = True
    dtype: jnp.dtype = jnp.float32
    kernel_init: callable = nn.initializers.variance_scaling(2.0, "fan_in", "normal")
    use_pallas: bool = False
    parity: bool = False        # parity rewrite of the merged output head

    @property
    def num_adain_params(self) -> int:
        # 2 convs per resblock, (bias, scale) each of width dim
        return self.n_res * 2 * 2 * self.dim

    @nn.compact
    def __call__(self, content, adain_params):
        """content: [N, h, w, dim]; adain_params: [N, num_adain_params]."""
        kw = dict(activ=self.activ, pad_type=self.pad_type, dtype=self.dtype,
                  kernel_init=self.kernel_init)
        sp = adain_params.reshape(content.shape[0], self.n_res, 2, 2, self.dim)
        x = AdaINResBlocks(self.n_res, self.dim, use_pallas=self.use_pallas,
                           **kw)(content, sp)
        d = self.dim
        for _ in range(self.n_upsample):
            x = upsample2x(x)
            d //= 2
            x = Conv2dBlock(d, 5, 1, 2, norm="ln", use_pallas=self.use_pallas,
                            **kw)(x)
        if not self.use_attention:
            image = Conv2dBlock(self.out_dim, 7, 1, 3, norm="none",
                                activ="tanh", pad_type=self.pad_type,
                                dtype=self.dtype, kernel_init=self.kernel_init,
                                name="image_head")(x)
            return image, None

        # fused heads: one [7,7,d,out_dim+1] conv (see class docstring);
        # per-output-channel conv math is independent, so this is exact
        ik, ib = _ConvParams(self.out_dim, 7, d, self.kernel_init,
                             name="image_head")()
        ak, ab = _ConvParams(1, 7, d, self.kernel_init,
                             name="attention_head")()
        k = jnp.concatenate([ik, ak], axis=-1).astype(self.dtype)
        b = jnp.concatenate([ib, ab], axis=0).astype(self.dtype)
        if self.parity and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0:
            # 4 output channels use 4 of 128 MXU lanes; the parity-output
            # rewrite computes 16 channels at half resolution instead
            # (exact — ops/parity_conv.py)
            from dwcgan_tpu.ops.parity_conv import parity_conv_stride1_parity_out
            out = parity_conv_stride1_parity_out(
                x.astype(self.dtype), k, 3, self.pad_type) + b
        else:
            xp = pad2d(x, 3, self.pad_type).astype(self.dtype)
            out = jax.lax.conv_general_dilated(
                xp, k, window_strides=(1, 1), padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC")) + b
        image = jnp.tanh(out[..., :self.out_dim])
        attention = jax.nn.sigmoid(out[..., self.out_dim:])
        return image, attention


class Generator(nn.Module):
    """Content/style autoencoder + text style-transfer (AdaINGen_v2 parity).

    Methods (use `apply(..., method=...)`):
      encode(x)                     -> (content, style_mu, style_logvar)
      encode_txt(style, txt, lens)  -> (mu, logvar)
      decode(content, style_flat)   -> (image, attention)
      __call__(x)                   -> reconstruction (image)
    Styles are [N, num_cls, c_dim]; `decode`/`encode_txt` take the flattened
    attribute-major [N, num_cls*c_dim] form (== torch.cat(style_list, dim=1)).
    """

    cfg: GenConfig
    input_dim: int = 3
    vocab_size: int = 102
    dtype: jnp.dtype = jnp.float32
    init_type: str = "kaiming"
    embed_init_table: Optional[np.ndarray] = None
    use_pallas: bool = False
    parity_stems: bool = False   # parity-space 7x7 encoder stems
    parity_head: bool = False    # parity-space decoder output head
    stem_pallas: bool = False    # fused Pallas 7x7 encoder stems

    def setup(self):
        c = self.cfg
        ki = make_initializer(self.init_type)
        self.enc_style = StyleEncoder(
            dim=c.dim, n_downsample=c.style_downsample, c_dim=c.c_dim,
            num_cls=c.num_cls, activ=c.activ, pad_type=c.pad_type,
            use_map=c.use_map, dtype=self.dtype, kernel_init=ki,
            parity=self.parity_stems, stem_pallas=self.stem_pallas)
        self.enc_content = ContentEncoder(
            dim=c.dim, n_downsample=c.content_downsample, n_res=c.n_res,
            activ=c.activ, pad_type=c.pad_type, dtype=self.dtype, kernel_init=ki,
            use_pallas=self.use_pallas, parity=self.parity_stems,
            stem_pallas=self.stem_pallas)
        content_dim = self.enc_content.output_dim
        self.dec = Decoder(
            dim=content_dim, out_dim=self.input_dim,
            n_upsample=c.content_downsample, n_res=c.n_res, activ=c.activ,
            pad_type=c.pad_type, use_attention=c.use_attention,
            dtype=self.dtype, kernel_init=ki, use_pallas=self.use_pallas,
            parity=self.parity_head)
        self.enc_txt = TxtEncoder(
            vocab_size=self.vocab_size, embed_dim=c.embed_dim,
            hidden_size=c.hidden_size, c_dim=c.c_dim, num_cls=c.num_cls,
            num_layers=c.num_layers, dropout_in=c.dropout_in,
            dropout_out=c.dropout_out, dtype=self.dtype, kernel_init=ki,
            embed_init_table=self.embed_init_table)
        self.mlp = MLP(out_dim=self.dec.num_adain_params, dim=c.mlp_dim,
                       n_blk=3, norm="none", activ=c.activ, dtype=self.dtype,
                       kernel_init=ki)

    def encode(self, images, deterministic: bool = True):
        mu, logvar = self.enc_style(images, deterministic=deterministic)
        content = self.enc_content(images)
        return content, mu, logvar

    def encode_txt(self, style_flat, tokens, lengths, deterministic: bool = True):
        return self.enc_txt(style_flat, tokens, lengths, deterministic=deterministic)

    def decode(self, content, style_flat):
        adain_params = self.mlp(style_flat)
        return self.dec(content, adain_params)

    def __call__(self, images, deterministic: bool = True):
        """Image reconstruction; exists so .init() touches every submodule."""
        content, mu, _ = self.encode(images, deterministic=deterministic)
        style_flat = mu.reshape(mu.shape[0], -1)
        image, att = self.decode(content, style_flat)
        # touch the text encoder so init creates its params
        tok = jnp.zeros((images.shape[0], 4), jnp.int32)
        lens = jnp.full((images.shape[0],), 4, jnp.int32)
        self.encode_txt(style_flat, tok, lens, deterministic=deterministic)
        return image, att
