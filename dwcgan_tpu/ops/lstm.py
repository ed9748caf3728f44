"""Masked multi-layer bidirectional LSTM via `lax.scan`.

TPU-native replacement for the reference's sort + `pack_padded_sequence`
pipeline (`/root/reference/networks/networks_v2.py:213-254`): fixed-shape
padded batches, a boolean time mask freezing the carry past each sequence's
length, and the backward direction running over length-aware reversed
sequences — exactly the packed-sequence semantics, with zero dynamic shapes.

Performance notes:
- The input projection for *all* timesteps is one big batched matmul done
  outside the scan (MXU-friendly); the scan body only does the [B,H]x[H,4H]
  recurrent matmul.
- Gate order follows torch (i, f, g, o) for documentation; weights are
  `W_x [D, 4H]`, `W_h [H, 4H]`, single bias `b [4H]` (torch's two biases are
  redundant and collapse into one).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


def reverse_padded(x: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Reverse the valid prefix of each padded sequence.

    x: [B, T, ...], lengths: [B].  out[b, t] = x[b, len_b - 1 - t] for
    t < len_b; positions past the length are zeroed.
    """
    B, T = x.shape[0], x.shape[1]
    t = jnp.arange(T)[None, :]                       # [1, T]
    idx = lengths[:, None] - 1 - t                   # [B, T]
    valid = idx >= 0
    idx = jnp.clip(idx, 0, T - 1)
    gathered = jnp.take_along_axis(
        x, idx.reshape(B, T, *([1] * (x.ndim - 2))).astype(jnp.int32), axis=1)
    mask = valid.reshape(B, T, *([1] * (x.ndim - 2)))
    return jnp.where(mask, gathered, jnp.zeros_like(gathered))


def _uniform_init(bound: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)
    return init


class _LSTMDirection(nn.Module):
    """One direction of one layer; returns (outputs [B,T,H], h_T, c_T)."""

    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray):
        B, T, D = x.shape
        H = self.hidden
        bound = 1.0 / (H ** 0.5)  # torch LSTM default init range
        w_x = self.param("w_x", _uniform_init(bound), (D, 4 * H), jnp.float32)
        w_h = self.param("w_h", _uniform_init(bound), (H, 4 * H), jnp.float32)
        b = self.param("b", _uniform_init(bound), (4 * H,), jnp.float32)

        cd = self.dtype
        # all-timestep input projection in one matmul
        x_proj = (x.astype(cd) @ w_x.astype(cd) + b.astype(cd))  # [B, T, 4H]
        x_proj_t = jnp.swapaxes(x_proj, 0, 1)                    # [T, B, 4H]
        step_valid = (jnp.arange(T)[:, None] < lengths[None, :])  # [T, B]

        w_h_c = w_h.astype(cd)
        h0 = jnp.zeros((B, H), cd)
        c0 = jnp.zeros((B, H), cd)

        def step(carry, inp):
            h, c = carry
            gates_in, valid = inp
            gates = gates_in + h @ w_h_c
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            v = valid[:, None]
            h = jnp.where(v, h_new, h)
            c = jnp.where(v, c_new, c)
            out = jnp.where(v, h_new, jnp.zeros_like(h_new))
            return (h, c), out

        (h_fin, c_fin), outs = jax.lax.scan(step, (h0, c0), (x_proj_t, step_valid))
        return jnp.swapaxes(outs, 0, 1), h_fin, c_fin


class _LSTMBiFused(nn.Module):
    """Both directions of one layer in a single scan at doubled batch.

    The forward stream and the length-reversed stream stack along the batch
    axis, so per layer there is ONE scan of [2B, 4H] gate matmuls instead of
    two [B, 4H] scans — half the sequential launches, better MXU shapes.
    Parameter SHAPES match the unfused `_LSTMDirection` modules, but the
    tree layout differs (`l{i}/fwd_w_x` here vs `l{i}_fwd/w_x` unfused):
    checkpoints are NOT interchangeable across `fuse_directions` settings —
    pick one per training run.
    """

    hidden: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_rev: jnp.ndarray, lengths: jnp.ndarray):
        B, T, D = x.shape
        H = self.hidden
        bound = 1.0 / (H ** 0.5)

        def direction_params(name):
            w_x = self.param(f"{name}_w_x", _uniform_init(bound), (D, 4 * H), jnp.float32)
            w_h = self.param(f"{name}_w_h", _uniform_init(bound), (H, 4 * H), jnp.float32)
            b = self.param(f"{name}_b", _uniform_init(bound), (4 * H,), jnp.float32)
            return w_x, w_h, b

        fx, fh, fb = direction_params("fwd")
        bx, bh, bb = direction_params("bwd")
        cd = self.dtype

        # input projections for both streams in two big matmuls
        proj_f = x.astype(cd) @ fx.astype(cd) + fb.astype(cd)       # [B, T, 4H]
        proj_b = x_rev.astype(cd) @ bx.astype(cd) + bb.astype(cd)
        proj = jnp.swapaxes(jnp.concatenate([proj_f, proj_b], axis=0), 0, 1)  # [T, 2B, 4H]
        # block-diagonal recurrent weight never materialized: split h instead
        w_h2 = jnp.stack([fh.astype(cd), bh.astype(cd)])            # [2, H, 4H]

        valid = (jnp.arange(T)[:, None] < lengths[None, :])
        step_valid = jnp.concatenate([valid, valid], axis=1)        # [T, 2B]

        h0 = jnp.zeros((2 * B, H), cd)
        c0 = jnp.zeros((2 * B, H), cd)

        def step(carry, inp):
            h, c = carry
            gates_in, v = inp
            # two plain [B,H]x[H,4H] matmuls (a batched dot_general inside
            # the scan blows up TPU compile time)
            rec = jnp.concatenate([h[:B] @ w_h2[0], h[B:] @ w_h2[1]], axis=0)
            gates = gates_in + rec
            i, f, g, o = jnp.split(gates, 4, axis=-1)
            c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
            h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
            vv = v[:, None]
            h = jnp.where(vv, h_new, h)
            c = jnp.where(vv, c_new, c)
            out = jnp.where(vv, h_new, jnp.zeros_like(h_new))
            return (h, c), out

        (h_fin, c_fin), outs = jax.lax.scan(step, (h0, c0), (proj, step_valid))
        outs = jnp.swapaxes(outs, 0, 1)                              # [2B, T, H]
        return (outs[:B], outs[B:], h_fin[:B], h_fin[B:], c_fin[:B], c_fin[B:])


class MaskedBiLSTM(nn.Module):
    """num_layers-deep bidirectional masked LSTM.

    Returns (outputs [B, T, 2H] — fwd/bwd concatenated, time-aligned),
    plus final states stacked as [num_layers, 2, B, H] for h and c
    (dim 1 = direction: 0 fwd, 1 bwd).

    `fuse_directions` runs both directions in one scan at doubled batch
    (default; numerically identical, half the sequential scan steps).
    """

    hidden: int
    num_layers: int = 1
    dropout: float = 0.0  # inter-layer dropout (torch LSTM `dropout=`)
    dtype: jnp.dtype = jnp.float32
    fuse_directions: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, lengths: jnp.ndarray,
                 deterministic: bool = True
                 ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        hs, cs = [], []
        out = x
        for layer in range(self.num_layers):
            rev = reverse_padded(out, lengths)
            if self.fuse_directions:
                fused = _LSTMBiFused(self.hidden, self.dtype, name=f"l{layer}")
                y_f, y_b_rev, h_f, h_b, c_f, c_b = fused(out, rev, lengths)
            else:
                fwd = _LSTMDirection(self.hidden, self.dtype, name=f"l{layer}_fwd")
                bwd = _LSTMDirection(self.hidden, self.dtype, name=f"l{layer}_bwd")
                y_f, h_f, c_f = fwd(out, lengths)
                y_b_rev, h_b, c_b = bwd(rev, lengths)
            y_b = reverse_padded(y_b_rev, lengths)  # re-align to forward time
            out = jnp.concatenate([y_f, y_b], axis=-1)
            hs.append(jnp.stack([h_f, h_b]))
            cs.append(jnp.stack([c_f, c_b]))
            if layer + 1 < self.num_layers and self.dropout > 0.0:
                out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out, jnp.stack(hs), jnp.stack(cs)
