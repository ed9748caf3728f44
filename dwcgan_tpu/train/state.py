"""The training state: one pytree holding everything.

Where the reference scatters state across the Solver object — two models,
two deep-copied EMA models, two torch optimizers, two schedulers, a mutated
config (`solver.py:23-107`) — here a single `flax.struct` pytree carries
{gen, dis, EMA copies, both optimizer states, step, rng}.  One pytree means
one Orbax checkpoint and a lossless resume (the reference's resume drops
optimizer and EMA state, solver.py:370-372).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from dwcgan_tpu.config import Config
from dwcgan_tpu.models.discriminator import MsImageDis
from dwcgan_tpu.models.generator import Generator
from dwcgan_tpu.train.schedules import lr_schedule


@struct.dataclass
class TrainState:
    step: jnp.ndarray                 # int32 scalar
    gen_params: Any
    dis_params: Any
    ema_gen_params: Any               # EMA shadows (decay 0.999, utils.py:52-54)
    ema_dis_params: Any
    gen_opt_state: Any
    dis_opt_state: Any
    rng: jax.Array                    # base key; per-step keys fold in `step`


def _embedding_mask(params, frozen: bool):
    """Pytree mask: True where the param trains, False for frozen embedding.

    The reference freezes the pretrained word-embedding table
    (networks_v2.py:195); torch excludes requires_grad=False params from the
    optimizer — here an optax mask zeroes their updates (and weight decay).
    """
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def label(path_leaf):
        path, _ = path_leaf
        names = [getattr(p, "key", getattr(p, "name", "")) for p in path]
        return not (frozen and "embedding" in names)

    mask_flat = [label(pl) for pl in flat]
    treedef = jax.tree_util.tree_structure(params)
    return jax.tree_util.tree_unflatten(treedef, mask_flat)


def make_optimizer(cfg: Config, params, freeze_embedding: bool = False):
    """Adam with torch-style *coupled* weight decay; lr applied by the caller.

    torch.optim.Adam(weight_decay=wd) adds wd*param to the gradient before the
    moment updates (solver.py:65-68) — hence add_decayed_weights placed before
    scale_by_adam, not AdamW-style after.

    The learning rate is deliberately NOT part of this chain: the reference
    steps both schedulers once per *iteration* (train.py:110), but an optax
    scale_by_schedule counts only the transform's own updates — with
    n_critic > 1 the generator's schedule would lag.  The train step instead
    multiplies the updates by lr(global_step) (see step.py), keeping both
    nets on the reference's iteration-indexed schedule.
    """
    mask = _embedding_mask(params, freeze_embedding)
    tx = optax.chain(
        optax.masked(optax.add_decayed_weights(cfg.weight_decay), mask),
        optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2),
        optax.scale(-1.0),
    )
    if freeze_embedding:
        frozen_mask = jax.tree_util.tree_map(lambda m: not m, mask)
        tx = optax.chain(tx, optax.masked(optax.set_to_zero(), frozen_mask))
    return tx


def build_models(cfg: Config, vocab_size: int,
                 embed_table: Optional[np.ndarray] = None):
    dtype = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else jnp.float32
    # Pallas kernels only on real TPU; CPU/virtual meshes use the jnp path
    use_pallas = bool(cfg.use_pallas) and jax.default_backend() == "tpu"
    mode = cfg.parity_convs if isinstance(cfg.parity_convs, str) else \
        ("all" if cfg.parity_convs else "off")
    # fused Pallas stem kernel only on real TPU (CPU tests use the jnp
    # path; the kernel itself is pinned in interpret mode by
    # tests/test_stem_kernels.py)
    stem_pallas = bool(getattr(cfg, "stem_pallas", False)) \
        and jax.default_backend() == "tpu"
    gen = Generator(cfg=cfg.gen, input_dim=cfg.input_dim, vocab_size=vocab_size,
                    dtype=dtype, init_type=cfg.init,
                    embed_init_table=embed_table, use_pallas=use_pallas,
                    parity_stems=mode in ("all", "stems"),
                    parity_head=mode in ("all", "head"),
                    stem_pallas=stem_pallas)
    # parity applies to the generator only: the D-stem (4x4/s2) rewrite
    # measured SLOWER than XLA's native lowering (docs/PERF.md round-3 A/B),
    # while the 7x7 encoder stems and the decoder head win.  The flag stays
    # plumbed through MsImageDis for future hardware where the balance flips.
    dis = MsImageDis(cfg=cfg.dis, dtype=dtype, init_type="gaussian",
                     parity=False)
    return gen, dis


def create_train_state(cfg: Config, rng: jax.Array, vocab_size: int,
                       embed_table: Optional[np.ndarray] = None) -> TrainState:
    """Initialize models, optimizers and EMA shadows."""
    gen, dis = build_models(cfg, vocab_size, embed_table)
    k_gen, k_dis, k_state = jax.random.split(rng, 3)
    dummy = jnp.zeros((1, cfg.image_size, cfg.image_size, cfg.input_dim), jnp.float32)
    gen_vars = gen.init({"params": k_gen, "dropout": k_gen}, dummy,
                        deterministic=True)
    dis_vars = dis.init({"params": k_dis}, dummy)
    gen_params = gen_vars["params"]
    dis_params = dis_vars["params"]

    freeze = embed_table is not None
    gen_tx = make_optimizer(cfg, gen_params, freeze_embedding=freeze)
    dis_tx = make_optimizer(cfg, dis_params)

    return TrainState(
        step=jnp.zeros((), jnp.int32),
        gen_params=gen_params,
        dis_params=dis_params,
        ema_gen_params=jax.tree_util.tree_map(jnp.copy, gen_params),
        ema_dis_params=jax.tree_util.tree_map(jnp.copy, dis_params),
        gen_opt_state=gen_tx.init(gen_params),
        dis_opt_state=dis_tx.init(dis_params),
        rng=k_state,
    )


def ema_update(params, ema_params, decay: float = 0.999):
    """param_copy = lerp(param, param_copy, decay) (utils.py:52-54)."""
    return optax.incremental_update(params, ema_params, step_size=1.0 - decay)
