"""Adversarial, classification, reconstruction, diversity and penalty losses.

Pure functions over discriminator outputs — the reference hangs these on the
MsImageDis module (`/root/reference/networks/networks.py:116-170`) and the
Solver (`solver.py:113-125, 181, 291-315`); in JAX they are just terms inside
the jitted train step.  All reductions in float32.

Input-gradient penalties (R1 / WGAN-GP) take the discriminator apply
function and differentiate w.r.t. the *image* via `jax.grad` — the natural
expression of the reference's `torch.autograd.grad` gymnastics.
"""

from __future__ import annotations

from typing import Callable, List, Tuple

import jax
import jax.numpy as jnp

DisOuts = List[Tuple[jnp.ndarray, jnp.ndarray]]  # per scale: (src_map, cls_logits)


def _bce_logits(logits: jnp.ndarray, targets: jnp.ndarray) -> jnp.ndarray:
    """Mean binary cross-entropy with logits (stable form)."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    return jnp.mean(jnp.maximum(logits, 0) - logits * targets
                    + jnp.log1p(jnp.exp(-jnp.abs(logits))))


def focal_loss(inputs: jnp.ndarray, targets: jnp.ndarray, alpha: float = 1.0,
               gamma: float = 2.0, logits: bool = True,
               use_reduce: bool = True) -> jnp.ndarray:
    """Focal loss (reference `networks.py:18-37`; instantiated at `:76` but
    bypassed by `_classification_loss` — provided for C17 block parity).

    alpha * (1 - exp(-bce))**gamma * bce, elementwise; mean when use_reduce.
    """
    x = inputs.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    if logits:
        bce = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    else:
        eps = 1e-12
        bce = -(t * jnp.log(x + eps) + (1.0 - t) * jnp.log(1.0 - x + eps))
    pt = jnp.exp(-bce)
    out = alpha * (1.0 - pt) ** gamma * bce
    return jnp.mean(out) if use_reduce else out


def adversarial_d_loss(src_fake: jnp.ndarray, src_real: jnp.ndarray,
                       gan_type: str) -> jnp.ndarray:
    """Per-scale D adversarial term (networks.py:129-140)."""
    f = src_fake.astype(jnp.float32)
    r = src_real.astype(jnp.float32)
    if gan_type == "lsgan":
        return jnp.mean(jnp.square(f)) + jnp.mean(jnp.square(r - 1.0))
    if gan_type == "nsgan":
        return _bce_logits(f, jnp.zeros_like(f)) + _bce_logits(r, jnp.ones_like(r))
    if gan_type == "wgan":
        return jnp.mean(f) - jnp.mean(r)
    raise ValueError(f"unsupported gan_type {gan_type}")


def adversarial_g_loss(src_fake: jnp.ndarray, gan_type: str) -> jnp.ndarray:
    """Per-scale G adversarial term (networks.py:157-165)."""
    f = src_fake.astype(jnp.float32)
    if gan_type == "lsgan":
        return jnp.mean(jnp.square(f - 1.0))
    if gan_type == "nsgan":
        return _bce_logits(f, jnp.ones_like(f))
    if gan_type == "wgan":
        return -jnp.mean(f)
    raise ValueError(f"unsupported gan_type {gan_type}")


def classification_loss(logits: jnp.ndarray, target: jnp.ndarray,
                        dataset: str = "CelebA") -> jnp.ndarray:
    """Attribute classification: BCE for multi-label datasets, softmax CE for
    categorical ones (networks.py:78-85)."""
    if dataset in ("CelebA", "CUB200"):
        return _bce_logits(logits, target)
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, target[:, None].astype(jnp.int32), axis=1))


def dis_loss(outs_fake: DisOuts, outs_real: DisOuts, real_cls: jnp.ndarray,
             gan_type: str, dataset: str, gan_w: float = 1.0,
             cls_w: float = 1.0) -> jnp.ndarray:
    """Full D loss over scales: adversarial + attr-cls on reals
    (calc_dis_loss, networks.py:116-146)."""
    loss = 0.0
    for (src_f, _), (src_r, cls_r) in zip(outs_fake, outs_real):
        loss += adversarial_d_loss(src_f, src_r, gan_type) * gan_w
        loss += classification_loss(cls_r, real_cls, dataset) * cls_w
    return loss


def gen_adv_loss(outs_fake: DisOuts, target_cls: jnp.ndarray, gan_type: str,
                 dataset: str, gan_w: float = 1.0, cls_w: float = 1.0) -> jnp.ndarray:
    """Full G adversarial loss over scales: fool D + attr-cls toward target
    (calc_gen_loss, networks.py:148-170)."""
    loss = 0.0
    for src_f, cls_f in outs_fake:
        loss += adversarial_g_loss(src_f, gan_type) * gan_w
        loss += classification_loss(cls_f, target_cls, dataset) * cls_w
    return loss


def recon_l1(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute error (solver.py:113-114)."""
    return jnp.mean(jnp.abs(x.astype(jnp.float32) - y.astype(jnp.float32)))


def diversity_loss(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Mode-seeking term |x1 - stop_grad(x2)| (solver.py:181); the caller
    SUBTRACTS it with a decaying weight (solver.py:238)."""
    return jnp.mean(jnp.abs(x1.astype(jnp.float32)
                            - jax.lax.stop_gradient(x2).astype(jnp.float32)))


def isometry_constraint(z1, z2, rec_z1, rec_z2) -> jnp.ndarray:
    """|d(z1,z2) - d(rec_z1,rec_z2)| with d = mean L1-sum distance
    (solver.py:116-121; defined but never called in the reference —
    provided for capability parity)."""
    def dist(a, b):
        return jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).sum(axis=1))
    return jnp.abs(dist(z1, z2) - dist(rec_z1, rec_z2))


def mode_seeking_constraint(im1, im2, z1, z2, eps: float = 1e-5) -> jnp.ndarray:
    """1 / (|im1-im2| / |z1-z2| + eps) (solver.py:123-125; unused in the
    reference training path — provided for capability parity)."""
    ratio = jnp.mean(jnp.abs(im1 - im2)) / jnp.mean(jnp.abs(z1 - z2))
    return 1.0 / (ratio + eps)


def r1_penalty(dis_apply: Callable[[jnp.ndarray], jnp.ndarray],
               x_real: jnp.ndarray) -> jnp.ndarray:
    """R1-style penalty on reals (solver.py:305-315).

    The reference squares the squared-gradient-norm (`dydx_l2sqr**2`, a
    deliberate-or-not deviation from standard R1); reproduced exactly.
    `dis_apply` maps images -> scalar-summed src logits of scale 0.
    """
    grads = jax.grad(lambda x: dis_apply(x).astype(jnp.float32).sum())(x_real)
    g2 = jnp.sum(jnp.square(grads.reshape(grads.shape[0], -1).astype(jnp.float32)), axis=1)
    return jnp.mean(jnp.square(g2))


def gradient_penalty(dis_apply: Callable[[jnp.ndarray], jnp.ndarray],
                     x_hat: jnp.ndarray) -> jnp.ndarray:
    """WGAN-GP on interpolates: (||d out/d x|| - 1)^2 (solver.py:291-303)."""
    grads = jax.grad(lambda x: dis_apply(x).astype(jnp.float32).sum())(x_hat)
    norm = jnp.sqrt(jnp.sum(jnp.square(
        grads.reshape(grads.shape[0], -1).astype(jnp.float32)), axis=1) + 1e-12)
    return jnp.mean(jnp.square(norm - 1.0))
