"""Offline tool: convert torchvision inception_v3 weights to flax variables
for the in-repo FID/IS harness (no egress in this image — the user supplies
`inception_v3_google-*.pth`).

    python -m dwcgan_tpu.cli.convert_inception --torch_weights iv3.pth --out iv3.npz
"""

from __future__ import annotations

import argparse

import numpy as np


def convert(torch_weights: str, out: str):
    import torch

    sd = torch.load(torch_weights, map_location="cpu")
    arrays = {}
    for key, val in sd.items():
        v = val.numpy()
        if key.endswith(".conv.weight"):
            arrays[key.replace(".conv.weight", "/conv/kernel")] = v.transpose(2, 3, 1, 0)
        elif key.endswith(".bn.weight"):
            arrays[key.replace(".bn.weight", "/bn_gamma")] = v
        elif key.endswith(".bn.bias"):
            arrays[key.replace(".bn.bias", "/bn_beta")] = v
        elif key.endswith(".bn.running_mean"):
            arrays[key.replace(".bn.running_mean", "/bn_mean")] = v
        elif key.endswith(".bn.running_var"):
            arrays[key.replace(".bn.running_var", "/bn_var")] = v
        elif key == "fc.weight":
            arrays["fc/kernel"] = v.T
        elif key == "fc.bias":
            arrays["fc/bias"] = v
    np.savez(out, **arrays)
    print(f"wrote {out} with {len(arrays)} arrays")


def load_converted(path: str):
    """Rebuild the flax variables dict from a converted .npz."""
    import jax.numpy as jnp

    data = np.load(path)
    params: dict = {}
    for key in data.files:
        parts = key.replace(".", "/").split("/")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[key])
    return {"params": params}


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--torch_weights", required=True)
    p.add_argument("--out", required=True)
    a = p.parse_args()
    convert(a.torch_weights, a.out)
