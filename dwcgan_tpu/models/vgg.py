"""VGG16 perceptual-loss network (reference C18).

The reference hand-rolls VGG16 through relu5_3 (`networks.py:639-688`),
auto-downloads Lua-torch weights (`utils.py:180-194`), preprocesses
RGB->BGR + ImageNet-mean subtraction (`utils.py:207-217`), and takes the MSE
of instance-normalized features (`solver.py:242-247`).

TPU version: NHWC flax module; weights load from an .npz produced by
`dwcgan_tpu.cli.convert_vgg` (offline tool converting a torchvision
state_dict — this image has no network egress, so weights must be supplied
by the user).  With no weights available the perceptual term stays off
(cfg.vgg_w gates it, matching the reference's optional load at
solver.py:79-83).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from dwcgan_tpu.ops.norms import instance_norm

# (name, out_channels, followed_by_pool)
_LAYERS = (
    ("conv1_1", 64, False), ("conv1_2", 64, True),
    ("conv2_1", 128, False), ("conv2_2", 128, True),
    ("conv3_1", 256, False), ("conv3_2", 256, False), ("conv3_3", 256, True),
    ("conv4_1", 512, False), ("conv4_2", 512, False), ("conv4_3", 512, False),
    ("conv5_1", 512, False), ("conv5_2", 512, False), ("conv5_3", 512, False),
)


class Vgg16Features(nn.Module):
    """VGG16 conv trunk; returns relu5_3 features (networks.py:660-687)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        for name, ch, pool in _LAYERS:
            x = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                        param_dtype=jnp.float32, name=name)(x)
            x = nn.relu(x)
            if pool:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


def vgg_preprocess(batch: jnp.ndarray) -> jnp.ndarray:
    """[-1,1] RGB NHWC -> BGR [0,255] minus ImageNet means (utils.py:207-217)."""
    bgr = batch[..., ::-1]
    bgr = (bgr + 1.0) * 255.0 * 0.5
    mean = jnp.asarray([103.939, 116.779, 123.680], jnp.float32)
    return bgr - mean


def load_vgg_params(path: str) -> Dict:
    """Load converted VGG16 weights from .npz ({name}_kernel HWIO / {name}_bias)."""
    data = np.load(path)
    params = {}
    for name, _, _ in _LAYERS:
        params[name] = {"kernel": jnp.asarray(data[f"{name}_kernel"]),
                        "bias": jnp.asarray(data[f"{name}_bias"])}
    return {"params": params}


def make_vgg_loss_fn(vgg_variables, dtype=jnp.float32):
    """Returns (x, y) -> mean squared error of instance-normed relu5_3
    features (solver.py:242-247)."""
    model = Vgg16Features(dtype=dtype)

    def loss_fn(x, y):
        fx = model.apply(vgg_variables, vgg_preprocess(x))
        fy = model.apply(vgg_variables, vgg_preprocess(y))
        diff = instance_norm(fx).astype(jnp.float32) - instance_norm(fy).astype(jnp.float32)
        return jnp.mean(jnp.square(diff))

    return loss_fn


def init_random_vgg(seed: int = 0):
    """Randomly initialized VGG variables — for tests and pipelines where no
    pretrained weights are available."""
    model = Vgg16Features()
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    return model.init(jax.random.PRNGKey(seed), x)
