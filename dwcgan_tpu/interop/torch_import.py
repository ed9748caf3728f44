"""Import reference (torch) DWC-GAN checkpoints into this framework.

Maps the reference's `AdaINGen_v2` / `MsImageDis` state_dicts
(`/root/reference/networks/networks_v2.py`, `networks.py`) onto our flax
param trees, so users with trained DWC-GAN models can switch frameworks
without retraining:

    state_dict = torch.load('gen_00200000.pt', map_location='cpu')['a']
    params = convert_reference_generator(state_dict, cfg.gen, vocab_size)

Also the backbone of the behavioral-equivalence tests: with identical
weights, our generator and the torch reference produce the same outputs.

Layout conventions converted here:
- conv kernels OIHW -> HWIO
- linear kernels [out, in] -> [in, out]
- the reference's per-attribute Linear heads (fcs/fcvars lists) -> our fused
  Dense of width num_cls*c_dim (block columns)
- torch LSTM (weight_ih/weight_hh per layer+direction, two biases) -> our
  fused-scan layout (w_x/w_h transposed, biases summed)
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _conv(sd, prefix):
    return {"kernel": np.asarray(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _dense(sd, prefix):
    return {"kernel": np.asarray(sd[f"{prefix}.weight"]).T,
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def _fused_heads(sd, prefix, num_cls):
    """fcs.{i} / fcvars.{i} lists -> one Dense with block columns."""
    ks = [np.asarray(sd[f"{prefix}.{i}.weight"]).T for i in range(num_cls)]
    bs = [np.asarray(sd[f"{prefix}.{i}.bias"]) for i in range(num_cls)]
    return {"kernel": np.concatenate(ks, axis=1), "bias": np.concatenate(bs)}


def _ln(sd, prefix):
    return {"ln_gamma": np.asarray(sd[f"{prefix}.gamma"]),
            "ln_beta": np.asarray(sd[f"{prefix}.beta"])}


def _to_np(sd):
    out = {}
    for k, v in sd.items():
        # copy() matters: torch's .numpy() shares storage with the live
        # parameter, and the downstream .T/.transpose() leaves are views —
        # without it a later in-place optimizer step on the source model
        # silently mutates the converted tree
        a = v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)
        out[k] = np.array(a, copy=True)
    return out


def convert_reference_generator(state_dict: Dict, gen_cfg,
                                vocab_size: int) -> Dict:
    """Torch AdaINGen_v2 state_dict -> flax Generator params ({'params': ...} inner)."""
    sd = _to_np(state_dict)
    K = gen_cfg.num_cls
    p: Dict = {}

    # --- style encoder: conv stack is model.0 .. model.{n-1} (pool has no params)
    enc_style: Dict = {}
    n_convs = 1 + 2 + (gen_cfg.style_downsample - 2)
    for i in range(n_convs):
        enc_style[f"Conv2dBlock_{i}"] = {"Conv_0": _conv(sd, f"enc_style.model.{i}.conv")}
    if gen_cfg.use_map:
        enc_style["map_0"] = _dense(sd, "enc_style.mapping.0")
        enc_style["map_1"] = _dense(sd, "enc_style.mapping.3")
    enc_style["head_mu"] = _fused_heads(sd, "enc_style.fcs", K)
    enc_style["head_logvar"] = _fused_heads(sd, "enc_style.fcvars", K)
    p["enc_style"] = enc_style

    # --- content encoder: convs model.0..n_down, then ResBlocks at model.{n_down+1}
    enc_content: Dict = {}
    for i in range(1 + gen_cfg.content_downsample):
        enc_content[f"Conv2dBlock_{i}"] = {"Conv_0": _conv(sd, f"enc_content.model.{i}.conv")}
    res_prefix = f"enc_content.model.{1 + gen_cfg.content_downsample}"
    resblocks: Dict = {}
    for b in range(gen_cfg.n_res):
        resblocks[f"ResBlock_{b}"] = {
            "Conv2dBlock_0": {"Conv_0": _conv(sd, f"{res_prefix}.model.{b}.model.0.conv")},
            "Conv2dBlock_1": {"Conv_0": _conv(sd, f"{res_prefix}.model.{b}.model.1.conv")},
        }
    enc_content["ResBlocks_0"] = resblocks
    p["enc_content"] = enc_content

    # --- decoder: model.0 = AdaIN ResBlocks; then (Upsample, Conv2dBlock[ln]) pairs
    dec: Dict = {}
    adain: Dict = {}
    for b in range(gen_cfg.n_res):
        adain[f"Conv2dBlock_{2 * b}"] = {
            "Conv_0": _conv(sd, f"dec.model.0.model.{b}.model.0.conv")}
        adain[f"Conv2dBlock_{2 * b + 1}"] = {
            "Conv_0": _conv(sd, f"dec.model.0.model.{b}.model.1.conv")}
    dec["AdaINResBlocks_0"] = adain
    for u in range(gen_cfg.content_downsample):
        t_idx = 2 + 2 * u  # torch: model.1=Upsample, model.2=conv, model.3=Upsample, model.4=conv
        dec[f"Conv2dBlock_{u}"] = {
            "Conv_0": _conv(sd, f"dec.model.{t_idx}.conv"),
            **_ln(sd, f"dec.model.{t_idx}.norm"),
        }
    dec["image_head"] = {"Conv_0": _conv(sd, "dec.image_content.conv")}
    if gen_cfg.use_attention:
        dec["attention_head"] = {"Conv_0": _conv(sd, "dec.image_attention.conv")}
    p["dec"] = dec

    # --- MLP
    p["mlp"] = {f"LinearBlock_{i}": {"Dense_0": _dense(sd, f"mlp.model.{i}.fc")}
                for i in range(3)}

    # --- text encoder
    enc_txt: Dict = {"embedding": np.asarray(sd["embed_tokens.weight"]
                                             if "embed_tokens.weight" in sd
                                             else sd["enc_txt.embed_tokens.weight"])}
    lstm: Dict = {}
    for layer in range(gen_cfg.num_layers):
        entry = {}
        for dname, suf in (("fwd", ""), ("bwd", "_reverse")):
            base = f"enc_txt.lstm.weight_ih_l{layer}{suf}"
            entry[f"{dname}_w_x"] = np.asarray(sd[base]).T
            entry[f"{dname}_w_h"] = np.asarray(sd[f"enc_txt.lstm.weight_hh_l{layer}{suf}"]).T
            entry[f"{dname}_b"] = (np.asarray(sd[f"enc_txt.lstm.bias_ih_l{layer}{suf}"])
                                   + np.asarray(sd[f"enc_txt.lstm.bias_hh_l{layer}{suf}"]))
        lstm[f"l{layer}"] = entry
    enc_txt["lstm"] = lstm

    # Head-input block order differs: the reference's cat([h,c],dim=1).view
    # at batch 1 yields [h_l0(f,b), c_l0(f,b), h_l1, c_l1, ...]
    # (networks_v2.py:249); ours is [h_all_layers..., c_all_layers...].
    # Permute the head kernels' input rows accordingly.
    L, H = gen_cfg.num_layers, gen_cfg.hidden_size

    def permute_txt_head(head):
        k = head["kernel"]  # [L*2*2*H, out] in reference row order
        k = k.reshape(L, 2, 2, H, -1)          # [layer, {h,c}, dir, H, out]
        k = k.transpose(1, 0, 2, 3, 4)         # [{h,c}, layer, dir, H, out]
        return {"kernel": k.reshape(L * 4 * H, -1), "bias": head["bias"]}

    enc_txt["head_mu"] = permute_txt_head(_fused_heads(sd, "enc_txt.fcs", K))
    enc_txt["head_logvar"] = permute_txt_head(_fused_heads(sd, "enc_txt.fcvars", K))
    p["enc_txt"] = enc_txt

    return {"params": _cast_tree(p)}


def convert_reference_discriminator(state_dict: Dict, dis_cfg) -> Dict:
    """Torch MsImageDis state_dict -> flax MsImageDis params."""
    sd = _to_np(state_dict)
    p: Dict = {}
    for s in range(dis_cfg.num_scales):
        tower: Dict = {}
        for j in range(dis_cfg.n_layer):
            tower[f"Conv2dBlock_{j}"] = {
                "Conv_0": _conv(sd, f"cnns_feat.{s}.{j}.conv")}
        tower["src_head"] = _conv(sd, f"cnns_src.{s}")
        tower["cls_head"] = {
            "kernel": np.asarray(sd[f"cnns_cls.{s}.weight"]).transpose(2, 3, 1, 0)}
        p[f"scale_{s}"] = tower
    return {"params": _cast_tree(p)}


def _cast_tree(tree):
    if isinstance(tree, dict):
        return {k: _cast_tree(v) for k, v in tree.items()}
    return np.asarray(tree, dtype=np.float32)
