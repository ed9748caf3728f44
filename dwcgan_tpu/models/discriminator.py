"""Multi-scale PatchGAN discriminator with auxiliary attribute classifier.

Equivalent capability to the reference's `MsImageDis`
(`/root/reference/networks/networks.py:43-114`): `num_scales` independent
towers of `n_layer` stride-2 convs (dim doubling, cap 512); each tower ends
in a 1x1 real/fake conv map and a full-receptive-field attribute-logit conv.
The input is exactly halved between scales (bilinear 0.5x == 2x2 mean,
networks.py:113 — see ops/resize.py).

Loss math lives in `dwcgan_tpu.losses.gan` (pure functions over the outputs),
not on the module — in JAX the D loss is just part of the jitted train step.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
from flax import linen as nn

from dwcgan_tpu.config import DisConfig
from dwcgan_tpu.ops.blocks import Conv2dBlock, make_initializer
from dwcgan_tpu.ops.resize import downsample2x


class _Tower(nn.Module):
    """One PatchGAN tower (reference `_make_net`, networks.py:87-100)."""

    cfg: DisConfig
    scale: int
    dtype: jnp.dtype = jnp.float32
    kernel_init: callable = nn.initializers.normal(stddev=0.02)
    parity: bool = False

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray]:
        c = self.cfg
        kw = dict(activ=c.activ, pad_type=c.pad_type, dtype=self.dtype,
                  kernel_init=self.kernel_init)
        d = c.dim
        x = Conv2dBlock(d, 4, 2, 1, norm="none", parity=self.parity, **kw)(x)
        for _ in range(c.n_layer - 1):
            d = min(d * 2, 512)
            x = Conv2dBlock(d, 4, 2, 1, norm=c.norm, **kw)(x)
        # real/fake patch map: 1x1 conv -> [N, h, w, 1]
        src = nn.Conv(1, (1, 1), padding="VALID", dtype=self.dtype,
                      param_dtype=jnp.float32, kernel_init=self.kernel_init,
                      name="src_head")(x)
        # attribute logits: full-receptive-field conv, no bias -> [N, num_cls]
        k = (c.image_size // (2 ** self.scale)) // (2 ** c.n_layer)
        cls = nn.Conv(c.num_cls, (k, k), padding="VALID", use_bias=False,
                      dtype=self.dtype, param_dtype=jnp.float32,
                      kernel_init=self.kernel_init, name="cls_head")(x)
        return src, cls.reshape(cls.shape[0], -1)


class MsImageDis(nn.Module):
    """Multi-scale discriminator; returns per-scale (src_map, cls_logits)."""

    cfg: DisConfig
    dtype: jnp.dtype = jnp.float32
    init_type: str = "gaussian"    # reference re-inits D gaussian (solver.py:74)
    parity: bool = False

    @nn.compact
    def __call__(self, x, multiscale: bool = True) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
        ki = make_initializer(self.init_type)
        outs = []
        n = self.cfg.num_scales if multiscale else 1
        for i in range(self.cfg.num_scales):
            tower = _Tower(self.cfg, scale=i, dtype=self.dtype, kernel_init=ki,
                           parity=self.parity, name=f"scale_{i}")
            if i < n:
                outs.append(tower(x))
                if i + 1 < n:
                    x = downsample2x(x)
            elif self.is_initializing():
                # param tree must be call-invariant: materialize every
                # tower's params even when only scale 0 is evaluated
                _ = tower(downsample2x(x))
        return outs
