"""Import a trained reference (torch) DWC-GAN checkpoint into an Orbax
checkpoint this framework can train from or serve with.

    python -m dwcgan_tpu.cli.import_reference \
        --config configs/celeba_faces.yaml \
        --gen_pt gen_00200000.pt --dis_pt dis_00200000.pt \
        --out imported_ckpt --step 200000

The resulting directory works with `--resume 1` (optimizer/EMA state start
fresh; EMA shadows are initialized to the imported params, mirroring the
reference's own resume which re-copies EMA from the live nets, train.py:87).
Behavioral equivalence of the conversion is pinned by
tests/test_torch_import.py.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", default="configs/celeba_faces.yaml")
    p.add_argument("--gen_pt", required=True)
    p.add_argument("--dis_pt", default=None)
    p.add_argument("--out", required=True)
    p.add_argument("--step", type=int, default=0)
    args = p.parse_args(argv)

    import torch

    from dwcgan_tpu.config import load_config
    from dwcgan_tpu.interop.torch_import import (
        convert_reference_discriminator, convert_reference_generator)
    from dwcgan_tpu.text.vocab import Vocab
    from dwcgan_tpu.train.checkpoint import CheckpointManager
    from dwcgan_tpu.train.state import create_train_state

    cfg = load_config(args.config)
    vocab = Vocab(cfg.dataset)
    state = create_train_state(cfg, jax.random.PRNGKey(cfg.seed), vocab.size)

    gen_sd = torch.load(args.gen_pt, map_location="cpu")
    gen_sd = gen_sd.get("a", gen_sd)  # reference saves {'a': state_dict}
    gen_params = convert_reference_generator(gen_sd, cfg.gen, vocab.size)["params"]
    state = state.replace(
        gen_params=gen_params,
        ema_gen_params=jax.tree_util.tree_map(jnp.asarray, gen_params))

    if args.dis_pt:
        dis_sd = torch.load(args.dis_pt, map_location="cpu")
        dis_sd = dis_sd.get("b", dis_sd)  # reference saves {'b': state_dict}
        dis_params = convert_reference_discriminator(dis_sd, cfg.dis)["params"]
        state = state.replace(
            dis_params=dis_params,
            ema_dis_params=jax.tree_util.tree_map(jnp.asarray, dis_params))

    state = state.replace(step=jnp.asarray(args.step, jnp.int32))
    mgr = CheckpointManager(args.out)
    mgr.save(state, wait=True)
    mgr.close()
    print(f"imported checkpoint written to {args.out}/{args.step}")


if __name__ == "__main__":
    main()
