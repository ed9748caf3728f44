"""Inference and visualization sampling.

- `make_infer_fn`: minimal text-guided translation (reference
  `Solver.forward`, solver.py:142-149).
- `make_sample_fn`: the monitoring grid — [real, reconstruction, text-guided,
  sampled-style] rows plus an attention row (reference `Solver.sample`,
  solver.py:249-289).  The reference loops per image in Python; here the
  whole batch runs in one jitted call.

Both default to the EMA ("smoothed") generator parameters at the call site.
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp

from dwcgan_tpu.config import Config
from dwcgan_tpu.train.sampling import blend_attention, sample_style, style_replace


def make_infer_fn(cfg: Config, gen):
    """Returns jittable infer(params, image, txt, txt_len) -> edited image."""
    from dwcgan_tpu.ops.norms import set_compute_mode, set_stats_mode
    set_stats_mode(cfg.norm_stats)
    set_compute_mode(getattr(cfg, "norm_compute", "fp32"))

    def infer(params, x_real, txt, txt_len):
        content, mu, _ = gen.apply({"params": params}, x_real, method="encode")
        style_real = mu.reshape(mu.shape[0], -1)
        mu_txt, _ = gen.apply({"params": params}, style_real, txt, txt_len,
                              method="encode_txt")
        img, att = gen.apply({"params": params}, content,
                             mu_txt.reshape(mu.shape[0], -1), method="decode")
        return blend_attention(img, att, x_real)

    return infer


def make_sample_fn(cfg: Config, gen):
    """Returns jittable sample(params, key, image, txt, txt_len, att_on)
    -> list of image rows [N,H,W,3] (+ attention row when enabled)."""
    C = cfg.c_dim
    use_att = cfg.gen.use_attention

    blend = blend_attention

    def sample(params, key, x_real, txt, txt_len, att_on) -> List[jnp.ndarray]:
        n = x_real.shape[0]
        content, mu, _ = gen.apply({"params": params}, x_real, method="encode")
        style_real = mu.reshape(n, -1)
        mu_txt, _ = gen.apply({"params": params}, style_real, txt, txt_len,
                              method="encode_txt")
        style_txt = mu_txt.reshape(n, -1)

        dec = lambda s: gen.apply({"params": params}, content, s, method="decode")
        x_rec, att_rec = dec(style_real)
        x_trg, att_trg = dec(style_txt)

        # +/-1 component id from the sign of each attribute block's mean
        # (solver.py:262-268)
        mus_real = jnp.where(mu.mean(axis=2) < 0.0, -1.0, 1.0)
        mus_txt = jnp.where(mu_txt.mean(axis=2) < 0.0, -1.0, 1.0)
        z = sample_style(key, mus_txt, C, cfg.stddev)
        z = style_replace(mus_real, mus_txt, style_real, z, C)
        x_sam, att_sam = dec(z)

        rows = [
            x_real.astype(jnp.float32),
            blend(x_rec, att_rec, x_real, att_on),
            blend(x_trg, att_trg, x_real, att_on),
            blend(x_sam, att_sam, x_real, att_on),
        ]
        if use_att:
            # visualize attention in [-1, 1] like images (solver.py:277,287)
            a = jnp.repeat(att_trg.astype(jnp.float32), 3, axis=-1)
            rows.append((a - 0.5) / 0.5)
        return rows

    return sample
