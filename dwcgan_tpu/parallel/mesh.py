"""Device mesh + sharding layer.

The reference has NO distributed support at all — single process, single GPU
(`/root/reference/train.py:42`; SURVEY §2 C24).  This module is the TPU-native
replacement: a 2-D `jax.sharding.Mesh` over ('data', 'model'):

- data axis: batch sharded, gradients averaged by XLA-inserted all-reduces
  over ICI — the first-class strategy for this conv-GAN workload
- model axis: optional tensor parallelism for the widest layers (the style
  MLP's 4096-wide AdaIN head and the 512-channel discriminator towers);
  param shardings are annotated by name-pattern and XLA inserts the
  collectives

Parameters not matched by a TP rule are replicated.  RNG decorrelation across
data shards is automatic: the per-step key generates the full [B, ...] random
tensors and each device materializes only its batch rows.
"""

from __future__ import annotations

import re
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"

# name-pattern -> which param dim to shard over the model axis.
# Conv kernels are HWIO (shard O = dim 3 or I = dim 2); Dense kernels are
# [in, out].  Rules chosen so each matched layer's matmul contracts locally
# and XLA reduces over the model axis once.  The MLP is built with n_blk=3:
# LinearBlock_0 (64->256), LinearBlock_1 (256->256), LinearBlock_2 (256->4096
# AdaIN head — the widest matmul in the model).
_TP_RULES = (
    # style MLP: middle layer shards its 256-wide output; the 256x4096 AdaIN
    # head then shards its input (contracting) dim — one psum at the head
    (re.compile(r"mlp/LinearBlock_1/Dense_0/kernel$"), 1),
    (re.compile(r"mlp/LinearBlock_2/Dense_0/kernel$"), 0),
    # discriminator towers: the 512-channel deep convs shard their output
    # channels (dims cap at 512 from layer 3 on, networks.py:92-95)
    (re.compile(r"scale_\d+/Conv2dBlock_[34]/Conv_0/kernel$"), 3),
    # text/style Gaussian heads: the TxtEncoder heads contract the 2400-wide
    # concatenated LSTM finals (networks_v2.py:249-254) — the widest Dense
    # inputs in the model; shard the contracting dim, one psum per head
    (re.compile(r"head_(mu|logvar)/kernel$"), 0),
    # bi-LSTM gate kernels: shard the 4H-wide fused-gate output dim (1200 for
    # the flagship's hidden 300).  The per-gate H-slices then each live half
    # on each shard; GSPMD inserts the regather at the nonlinearities inside
    # the scan body
    (re.compile(r"lstm/l\d+(_fwd|_bwd)?/(fwd|bwd)?_?w_[xh]$"), 1),
)


def maybe_initialize_distributed():
    """Initialize jax.distributed for multi-host (pod) runs.

    The reference has no multi-process story at all (SURVEY §2 C24); on TPU
    pods each host runs this same program and `jax.devices()` spans the pod.

    Triggers on (a) explicit coordinator env vars, or (b) TPU pod metadata
    (TPU_WORKER_HOSTNAMES listing more than one host — Cloud TPU sets this;
    `jax.distributed.initialize()` then auto-detects coordinates).  Plain
    single-host runs never attempt initialization, so environments without a
    coordinator cannot hang here.
    """
    import os

    explicit = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS")
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    multi_host = len([h for h in hostnames.split(",") if h.strip()]) > 1
    if explicit or multi_host:
        try:
            jax.distributed.initialize()
        except RuntimeError:
            pass  # already initialized


def create_mesh(data: int = -1, model: int = 1,
                devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ('data', 'model') mesh; data=-1 uses all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    if data == -1:
        assert len(devices) % model == 0
        data = len(devices) // model
    assert data * model <= len(devices), (
        f"mesh {data}x{model} needs {data*model} devices, have {len(devices)}")
    arr = np.asarray(devices[: data * model]).reshape(data, model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def shard_spec(mesh: Mesh, ndim: int, batch_dim: int = 0) -> NamedSharding:
    """Batch sharded over the data axis, everything else replicated."""
    spec = [None] * ndim
    spec[batch_dim] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def _path_str(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in path)


def param_shardings(mesh: Mesh, params, use_tp: bool = True):
    """NamedShardings for a param pytree: TP rules where they match,
    replicated otherwise."""

    def assign(path, leaf):
        if use_tp and mesh.shape[MODEL_AXIS] > 1:
            name = _path_str(path)
            for pat, dim in _TP_RULES:
                if pat.search(name) and leaf.ndim > dim \
                        and leaf.shape[dim] % mesh.shape[MODEL_AXIS] == 0:
                    spec = [None] * leaf.ndim
                    spec[dim] = MODEL_AXIS
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(assign, params)


def replicate(tree, mesh: Mesh):
    """Place every leaf fully replicated on the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def _place_opt_state(opt_state, params, shardings, mesh: Mesh):
    """Place an optax state: sub-trees structurally identical to the param
    tree (Adam's mu/nu, decay masks' shadows) follow the param shardings;
    everything else (step counts, empty states) replicates."""
    pdef = jax.tree_util.tree_structure(params)
    rep = NamedSharding(mesh, P())

    def is_params_like(node):
        try:
            return jax.tree_util.tree_structure(node) == pdef
        except Exception:
            return False

    def handle(node):
        if is_params_like(node):
            return jax.tree_util.tree_map(jax.device_put, node, shardings)
        return jax.device_put(node, rep)

    return jax.tree_util.tree_map(handle, opt_state, is_leaf=is_params_like)


def place_state(state, mesh: Mesh, use_tp: bool = True):
    """Place a TrainState on the mesh.

    Generator/discriminator params, their EMA shadows, and the param-shaped
    slots inside the optimizer states all share one sharding assignment (TP
    rules where matched, replicated otherwise); scalars replicate.
    """
    gen_sh = param_shardings(mesh, state.gen_params, use_tp)
    dis_sh = param_shardings(mesh, state.dis_params, use_tp)

    def put_like(tree, shardings):
        return jax.tree_util.tree_map(jax.device_put, tree, shardings)

    rep = NamedSharding(mesh, P())
    return state.replace(
        step=jax.device_put(state.step, rep),
        rng=jax.device_put(state.rng, rep),
        gen_params=put_like(state.gen_params, gen_sh),
        ema_gen_params=put_like(state.ema_gen_params, gen_sh),
        dis_params=put_like(state.dis_params, dis_sh),
        ema_dis_params=put_like(state.ema_dis_params, dis_sh),
        gen_opt_state=_place_opt_state(state.gen_opt_state, state.gen_params,
                                       gen_sh, mesh),
        dis_opt_state=_place_opt_state(state.dis_opt_state, state.dis_params,
                                       dis_sh, mesh),
    )
