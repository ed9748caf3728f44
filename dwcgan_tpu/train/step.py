"""The fused training step: one XLA program per iteration.

The reference runs `dis_update` then `gen_update` as separate Python calls
with separate backwards (`/root/reference/train.py:103-107`, `solver.py:151-240,
317-353`).  Here both updates — D forward/backward/apply, then G's full
4-encode / 5-decode / text-encode graph, both optimizers, the EMA updates,
and every loss term — compile into a single jitted function.  Independent
same-network passes are additionally *batch-fused*: G's four same-content
decodes run as one decoder pass at 4n, the three re-encodes as one encoder
pass at 3n, and the D evaluations as single 2n/3n passes (every op involved
is per-sample, so this is exact — just bigger MXU tiles and fewer kernel
launches).  Semantics deliberately preserved:

- D updates first and G's adversarial loss sees the *updated* D (the
  reference's sequential `dis_opt.step()` -> `gen_update` ordering)
- the D loss sees generator outputs through `stop_gradient` (the reference
  leaves the graph attached but discards G's gradients — solver.py note at
  SURVEY §3.3; stop_gradient is the efficient equivalent)
- diversity weight decays 1e-5 per G update from ds_w, floored at 0, and is
  SUBTRACTED (solver.py:183, 238)
- attention blending activates at iteration >= cfg.attention_warm_iter
  (default 10000 = the reference's hardcoded gate, solver.py:109-111),
  expressed as a traced `jnp.where` so it never retriggers compilation
- R1 penalty every d_reg_every=16 steps via `lax.cond` (solver.py:346-350)
- EMA (decay 0.999) every iteration for both nets (train.py:109)

Known deviation: the reference evaluates D on the real batch twice per D
step (once per `calc_dis_loss` call, networks.py:119-120); D is deterministic
so the second pass is identical and is computed once here.

Known deviation (shared G forward, `cfg.fuse_gd_forward`, n_critic == 1):
the reference's `dis_update` recomputes encode + text-encode + a 2n decode
from the SAME generator parameters `gen_update` is about to forward again
(solver.py:320-331 vs :151-209), with independent dropout and Gaussian
style draws; the D-side results are consumed only through an effective
detach.  Here that graph runs ONCE: `jax.vjp` records the G forward, D
updates against `stop_gradient` of its fakes, and G's adversarial head
(evaluated against the *updated* D, preserving the reference's ordering)
is pulled back through the saved vjp.  D therefore sees the same fake
realizations G trains on that step — same distribution, correlated
within-step draws — in exchange for dropping ~1 encoder pass, ~1 text-LSTM
pass, and a 2n decoder pass per iteration.  Gradients are exactly those of
the composed loss (chain rule via vjp), pinned by
tests/test_train_step.py::test_shared_forward_matches_manual_composition.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from dwcgan_tpu.config import Config
from dwcgan_tpu.losses.gan import (
    dis_loss, diversity_loss, gen_adv_loss, gradient_penalty, r1_penalty, recon_l1,
)
from dwcgan_tpu.losses.gmm import gmm_emd, gmm_kl
from dwcgan_tpu.train.sampling import blend_attention as _blend, sample_style
from dwcgan_tpu.train.schedules import lr_schedule
from dwcgan_tpu.train.state import TrainState, ema_update




def make_train_step(cfg: Config, gen, dis, gen_tx, dis_tx,
                    vgg_loss_fn=None, _shared_direct=False,
                    _deterministic=False):
    """Build the jitted train_step(state, batch) -> (state, metrics).

    vgg_loss_fn: optional callable (x, y) -> scalar perceptual loss; when
    None the vgg term is statically off (reference gates on vgg_w > 0 and
    model availability, solver.py:79-83).

    _shared_direct (test-only): in the shared-forward path, compute G's
    gradients by re-running the whole composition under `value_and_grad`
    instead of pulling the adversarial head back through the saved vjp —
    mathematically identical, used to pin the vjp composition.

    _deterministic (test-only): disable dropout everywhere (torch-side
    `.eval()` equivalent) for exact loss parity against the reference.
    """
    # pass batching (below) concatenates independent passes along the batch
    # axis, which is exact only for per-sample ops; 'bn' computes batch-axis
    # statistics and would silently mix real/fake stats in the fused 3n D
    # pass.  No shipped config uses 'bn' — reject it loudly (ADVICE r2).
    if cfg.dis.norm == "bn":
        raise ValueError(
            "dis.norm='bn' is incompatible with the pass-batched fused step: "
            "batch-norm statistics would mix real/fake samples in the "
            "concatenated discriminator pass. Use 'none'/'in'/'ln' (the "
            "reference flagship uses 'none', configs/celeba_faces.yaml).")
    # norm-statistics strategy is read at trace time (ops/norms.py); set it
    # here so the step traced from this factory uses cfg.norm_stats
    from dwcgan_tpu.ops.norms import set_compute_mode, set_stats_mode
    set_stats_mode(cfg.norm_stats)
    set_compute_mode(getattr(cfg, "norm_compute", "fp32"))
    K, C = cfg.gen.num_cls, cfg.c_dim
    stddev = cfg.stddev
    sigma_sq = cfg.stddev ** 2
    sched = lr_schedule(cfg)
    use_vgg = vgg_loss_fn is not None and cfg.vgg_w > 0 and cfg.recon_x_cyc_w > 0

    det = _deterministic

    def g_encode(p, x, key):
        return gen.apply({"params": p}, x, deterministic=det,
                         rngs={"dropout": key}, method="encode")

    def g_decode(p, content, style):
        return gen.apply({"params": p}, content, style, method="decode")

    def g_txt(p, style, txt, lens, key):
        return gen.apply({"params": p}, style, txt, lens, deterministic=det,
                         rngs={"dropout": key}, method="encode_txt")

    def d_apply(p, x, multiscale=True):
        return dis.apply({"params": p}, x, multiscale)

    if cfg.remat:
        # recompute sub-pass activations in the backward instead of saving
        # them: the step is HBM-bandwidth-heavy (PERF.md roofline) while the
        # MXU has headroom, so trading FLOPs for traffic can pay
        g_encode = jax.checkpoint(g_encode)
        g_decode = jax.checkpoint(g_decode)
        g_txt = jax.checkpoint(g_txt)
        _d_plain = d_apply
        _d_remat = jax.checkpoint(lambda p, x: _d_plain(p, x, True))

        def d_apply(p, x, multiscale=True):
            # single-scale callers are the R1/GP penalty paths (grad-of-grad
            # through D w.r.t. the image) — leave those un-remat'ed
            return _d_remat(p, x) if multiscale else _d_plain(p, x, False)

    # ---- pass batching ----
    # The reference runs 4 encoder / 5 decoder / 3 discriminator passes per G
    # step as separate module calls (SURVEY §3.2).  Every op involved is
    # per-sample (instance norm, layer norm, AdaIN, convs), so independent
    # passes concatenate along the batch axis into ONE pass at k*n batch:
    # fewer kernel launches and much better MXU utilization at small n.

    def _split(t, k):
        return jnp.split(t, k, axis=0) if t is not None else (None,) * k

    def _split_outs(outs, k):
        """Per-scale (src, cls) from a [k*n] batched D pass -> k DisOuts."""
        parts = [[jnp.split(src, k, 0), jnp.split(cls, k, 0)]
                 for (src, cls) in outs]
        return [[(src_s[i], cls_s[i]) for src_s, cls_s in parts]
                for i in range(k)]

    # ---------------- D update ----------------

    def dis_update(state: TrainState, batch, key, att_on, step, lr,
                   fakes=None):
        """D forward/backward/apply.  `fakes`: optional precomputed
        (x_fake, x_fake1), already blended and stop-gradient'ed (the shared
        G forward path); when None they are recomputed here with this
        phase's own keys (reference semantics, solver.py:320-331)."""
        x_real = batch.image
        c_trg = batch.trg_label * 2.0 - 1.0
        k_enc, k_txt, k_sty, k_gp = jax.random.split(key, 4)

        if fakes is not None:
            x_fake, x_fake1 = fakes
        else:
            # fakes from the current G, detached (solver.py:320-331); the
            # two decodes share the content code -> one decoder pass at 2n
            content, mu, _ = g_encode(state.gen_params, x_real, k_enc)
            style_real = mu.reshape(mu.shape[0], -1)
            mu_txt, _ = g_txt(state.gen_params, style_real, batch.txt,
                              batch.txt_len, k_txt)
            style1 = sample_style(k_sty, c_trg, C, stddev)
            x2, att2 = g_decode(state.gen_params,
                                jnp.tile(content, (2, 1, 1, 1)),
                                jnp.concatenate(
                                    [mu_txt.reshape(mu.shape[0], -1),
                                     style1], axis=0))
            xf, xf1 = _split(x2, 2)
            att_f, att_f1 = _split(att2, 2)
            x_fake = jax.lax.stop_gradient(_blend(xf, att_f, x_real, att_on))
            x_fake1 = jax.lax.stop_gradient(_blend(xf1, att_f1, x_real, att_on))

        def loss_fn(dp):
            # one multi-scale D pass over {real, fake, fake1} at 3n
            outs_real, outs_f, outs_f1 = _split_outs(
                d_apply(dp, jnp.concatenate([x_real, x_fake, x_fake1], 0)), 3)
            args = (batch.src_label, cfg.dis.gan_type, cfg.dataset,
                    cfg.gan_w, cfg.cls_w)
            loss = dis_loss(outs_f, outs_real, *args) \
                 + dis_loss(outs_f1, outs_real, *args)
            metrics = {"loss_dis": loss}

            loss_gp = jnp.zeros((), jnp.float32)
            if cfg.gp_w > 0:
                alpha = jax.random.uniform(k_gp, (x_real.shape[0], 1, 1, 1))
                x_hat = alpha * x_real + (1 - alpha) * x_fake
                src0 = lambda x: d_apply(dp, x, multiscale=False)[0][0]
                loss_gp = gradient_penalty(src0, x_hat) * cfg.gp_w
                loss += loss_gp
            metrics["loss_gp"] = loss_gp

            loss_r1 = jnp.zeros((), jnp.float32)
            if cfg.use_r1:
                src0 = lambda x: d_apply(dp, x, multiscale=False)[0][0]
                loss_r1 = jax.lax.cond(
                    (step + 1) % cfg.d_reg_every == 0,
                    lambda: r1_penalty(src0, x_real) * 5.0,  # 10./2 (solver.py:349)
                    lambda: jnp.zeros((), jnp.float32))
                loss += loss_r1
            metrics["loss_r1"] = loss_r1
            metrics["loss_dis_all"] = loss
            return loss, metrics

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.dis_params)
        metrics["grad_dis_norm"] = optax.global_norm(grads)
        updates, dis_opt_state = dis_tx.update(grads, state.dis_opt_state,
                                               state.dis_params)
        # lr is applied here, keyed to the global iteration (see make_optimizer)
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        dis_params = optax.apply_updates(state.dis_params, updates)
        return dis_params, dis_opt_state, metrics

    # ---------------- G forward (everything but the adversarial head) ----

    def g_forward(gp_, batch, keys, att_on, c_src, c_trg, ds_w):
        """G's full per-step graph minus the adversarial term.

        Returns ((x_fake, x_fake1, partial_loss), aux_metrics): the first
        tuple is differentiable (fed to `jax.vjp` in the shared-forward
        path); `partial_loss` is the weighted sum of every non-adversarial
        loss term, so total = partial_loss + adv(x_fake, x_fake1).
        Key discipline (part of the step contract, replicated by tests):
        keys[0] encode(x_real), keys[1] re-encode, keys[2] text encoder,
        keys[3]/keys[4] the two GMM style draws.
        """
        x_real = batch.image
        n = x_real.shape[0]
        content_real, mu, logvar = g_encode(gp_, x_real, keys[0])
        style_real = mu.reshape(n, -1)

        # target styles: text-conditioned + two GMM samples (solver.py:165,174)
        mu_txt, logvar_txt = g_txt(gp_, style_real, batch.txt,
                                   batch.txt_len, keys[2])
        style_txt = mu_txt.reshape(n, -1)
        style1 = sample_style(keys[3], c_trg, C, stddev)
        style2 = sample_style(keys[4], c_trg, C, stddev)

        # the reconstruction/translation/diversity decodes all share
        # content_real -> ONE decoder pass at 4n (solver.py:158-183)
        x4, att4 = g_decode(
            gp_, jnp.tile(content_real, (4, 1, 1, 1)),
            jnp.concatenate([style_real, style_txt, style1, style2], 0))
        xr, xf, xf1, xf2 = _split(x4, 4)
        att_r, att_xf, att1, att2 = _split(att4, 4)
        x_real_rec = _blend(xr, att_r, x_real, att_on)
        x_fake = _blend(xf, att_xf, x_real, att_on)
        x_fake1 = _blend(xf1, att1, x_real, att_on)
        x_fake2 = _blend(xf2, att2, x_real, att_on)
        loss_ds = diversity_loss(x_fake1, x_fake2)

        # re-encode {reconstruction, translation, sampled fake} in ONE
        # encoder pass at 3n (solver.py:162, 182, 186)
        content3, mu3, _ = g_encode(
            gp_, jnp.concatenate([x_real_rec, x_fake, x_fake1], 0), keys[1])
        content_real_rec, content_fake_rec, content_rand = _split(content3, 3)
        mu_rec, mu_fake_rec, mu_rand = _split(mu3, 3)

        # cycle (solver.py:188-192)
        loss_cyc = jnp.zeros((), jnp.float32)
        loss_vgg = jnp.zeros((), jnp.float32)
        if cfg.recon_x_cyc_w > 0:
            xc, att_c = g_decode(gp_, content_fake_rec, style_real)
            x_cycle = _blend(xc, att_c, x_real, att_on)
            loss_cyc = recon_l1(x_cycle, x_real)
            if use_vgg:
                loss_vgg = vgg_loss_fn(x_real, x_cycle)

        # reconstruction losses (solver.py:195-201)
        loss_recon_x = recon_l1(x_real_rec, x_real)
        loss_recon_c_real = recon_l1(content_real_rec, content_real)
        loss_recon_c_fake = recon_l1(content_fake_rec, content_real)
        loss_recon_c_rand = recon_l1(content_rand, content_real)
        loss_recon_s_real = recon_l1(mu_rec, mu)
        loss_recon_s_fake = recon_l1(mu_fake_rec, mu_txt)
        loss_recon_s_rand = recon_l1(mu_rand.reshape(n, -1), style1)

        # distribution matching to the GMM prior (solver.py:212-218)
        if cfg.dist_mode in ("kls", "kl"):
            loss_kl_x = gmm_kl(mu, logvar, c_src, sigma_sq)
            loss_kl_trg = gmm_kl(mu_txt, logvar_txt, c_trg, sigma_sq)
        else:
            loss_kl_x = gmm_emd(mu, c_src)
            loss_kl_trg = gmm_emd(mu_txt, c_trg)

        partial = (cfg.recon_x_w * loss_recon_x
                   + cfg.recon_c_w * (loss_recon_c_real + loss_recon_c_fake
                                      + loss_recon_c_rand)
                   + cfg.recon_s_w * (loss_recon_s_real + loss_recon_s_fake
                                      + loss_recon_s_rand)
                   + cfg.recon_x_cyc_w * loss_cyc
                   + cfg.kl_w * (loss_kl_x + loss_kl_trg)
                   + cfg.vgg_w * loss_vgg
                   - ds_w * loss_ds)

        aux = {
            "loss_gen_recon_x": loss_recon_x,
            "loss_gen_recon_c_real": loss_recon_c_real,
            "loss_gen_recon_c_fake": loss_recon_c_fake,
            "loss_gen_recon_c_rand": loss_recon_c_rand,
            "loss_gen_recon_s_real": loss_recon_s_real,
            "loss_gen_recon_s_fake": loss_recon_s_fake,
            "loss_gen_recon_s_rand": loss_recon_s_rand,
            "loss_gen_cycrecon_x": loss_cyc,
            "loss_kl_x": loss_kl_x,
            "loss_kl_trg": loss_kl_trg,
            "loss_gen_vgg": loss_vgg,
            "loss_ds": loss_ds,
            "ds_w": ds_w,
        }
        return (x_fake, x_fake1, partial), aux

    def g_adv(dis_p, x_fake, x_fake1, trg_label):
        """Adversarial G loss on both fakes, one 2n D pass (solver.py:208-209)."""
        adv_args = (trg_label, cfg.dis.gan_type, cfg.dataset,
                    cfg.gan_w, cfg.cls_w)
        outs_f, outs_f1 = _split_outs(
            d_apply(dis_p, jnp.concatenate([x_fake, x_fake1], 0)), 2)
        return gen_adv_loss(outs_f, *adv_args) + gen_adv_loss(outs_f1, *adv_args)

    def _apply_gen_grads(grads, gen_params, gen_opt_state, lr, metrics):
        metrics["grad_gen_norm"] = optax.global_norm(grads)
        updates, gen_opt_state = gen_tx.update(grads, gen_opt_state, gen_params)
        # lr keyed to the global iteration, matching the reference's
        # per-iteration scheduler stepping (train.py:110) under any n_critic
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        gen_params = optax.apply_updates(gen_params, updates)
        return gen_params, gen_opt_state, metrics

    # ---------------- G update (independent-forward path) ----------------

    def gen_update(gen_params, gen_opt_state, dis_params, batch, key, att_on,
                   gen_iter, lr):
        c_src = batch.src_label * 2.0 - 1.0
        c_trg = batch.trg_label * 2.0 - 1.0
        keys = jax.random.split(key, 8)
        # ds weight: decremented before use each G update (solver.py:183,238)
        ds_w = jnp.maximum(cfg.ds_w - (gen_iter + 1).astype(jnp.float32) * 1e-5, 0.0)

        def loss_fn(gp_):
            (x_fake, x_fake1, partial), aux = g_forward(
                gp_, batch, keys, att_on, c_src, c_trg, ds_w)
            loss_adv = g_adv(dis_params, x_fake, x_fake1, batch.trg_label)
            total = partial + loss_adv
            metrics = {**aux, "loss_gen_adv": loss_adv, "loss_gen_total": total}
            return total, metrics

        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(gen_params)
        return _apply_gen_grads(grads, gen_params, gen_opt_state, lr, metrics)

    # ---------------- fused step ----------------

    share_forward = cfg.fuse_gd_forward and cfg.n_critic == 1

    def train_step_shared(state: TrainState, batch
                          ) -> Tuple[TrainState, Dict[str, Any]]:
        """One G forward serves both phases (module docstring, deviation
        note).  Order preserved: D updates first; G's adversarial head sees
        the UPDATED D; the G backward then runs through the saved vjp."""
        step = state.step
        key = jax.random.fold_in(state.rng, step)
        k_d, k_g = jax.random.split(key)
        att_on = jnp.logical_and(cfg.gen.use_attention,
                                 step >= cfg.attention_warm_iter)
        lr = sched(step)
        c_src = batch.src_label * 2.0 - 1.0
        c_trg = batch.trg_label * 2.0 - 1.0
        keys = jax.random.split(k_g, 8)
        # n_critic == 1 -> gen_iter == step (solver.py:183,238)
        ds_w = jnp.maximum(cfg.ds_w - (step + 1).astype(jnp.float32) * 1e-5, 0.0)

        if _shared_direct:
            # test-only reference implementation: one plain forward feeds
            # D's fakes; G then re-runs the identical composition (same
            # keys -> identical values) under value_and_grad
            (x_fake, x_fake1, _), _ = g_forward(
                state.gen_params, batch, keys, att_on, c_src, c_trg, ds_w)
            fakes = (jax.lax.stop_gradient(x_fake),
                     jax.lax.stop_gradient(x_fake1))
            dis_params, dis_opt_state, d_metrics = dis_update(
                state, batch, k_d, att_on, step, lr, fakes=fakes)

            def loss_fn(gp_):
                (xf, xf1, partial), aux = g_forward(
                    gp_, batch, keys, att_on, c_src, c_trg, ds_w)
                loss_adv = g_adv(dis_params, xf, xf1, batch.trg_label)
                total = partial + loss_adv
                return total, {**aux, "loss_gen_adv": loss_adv,
                               "loss_gen_total": total}

            (_, g_metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.gen_params)
        else:
            diff_outs, g_vjp, g_aux = jax.vjp(
                lambda gp: g_forward(gp, batch, keys, att_on, c_src, c_trg,
                                     ds_w),
                state.gen_params, has_aux=True)
            x_fake, x_fake1, partial = diff_outs
            fakes = (jax.lax.stop_gradient(x_fake),
                     jax.lax.stop_gradient(x_fake1))

            dis_params, dis_opt_state, d_metrics = dis_update(
                state, batch, k_d, att_on, step, lr, fakes=fakes)

            def g_head(xf, xf1, part):
                loss_adv = g_adv(dis_params, xf, xf1, batch.trg_label)
                return part + loss_adv, loss_adv

            (total, loss_adv), head_ct = jax.value_and_grad(
                g_head, argnums=(0, 1, 2), has_aux=True)(x_fake, x_fake1,
                                                         partial)
            (grads,) = g_vjp(head_ct)
            g_metrics = {**g_aux, "loss_gen_adv": loss_adv,
                         "loss_gen_total": total}
        gen_params, gen_opt_state, g_metrics = _apply_gen_grads(
            grads, state.gen_params, state.gen_opt_state, lr, g_metrics)

        # EMA every iteration (train.py:108-109)
        new_state = state.replace(
            step=step + 1,
            gen_params=gen_params,
            dis_params=dis_params,
            gen_opt_state=gen_opt_state,
            dis_opt_state=dis_opt_state,
            ema_gen_params=ema_update(gen_params, state.ema_gen_params),
            ema_dis_params=ema_update(dis_params, state.ema_dis_params),
        )
        metrics = {**d_metrics, **g_metrics, "lr": lr}
        return new_state, metrics

    def train_step(state: TrainState, batch) -> Tuple[TrainState, Dict[str, Any]]:
        step = state.step
        key = jax.random.fold_in(state.rng, step)
        k_d, k_g = jax.random.split(key)
        att_on = jnp.logical_and(cfg.gen.use_attention,
                                 step >= cfg.attention_warm_iter)
        lr = sched(step)

        dis_params, dis_opt_state, d_metrics = dis_update(
            state, batch, k_d, att_on, step, lr)

        gen_iter = step // cfg.n_critic

        def run_g(_):
            return gen_update(state.gen_params, state.gen_opt_state,
                              dis_params, batch, k_g, att_on, gen_iter, lr)

        def skip_g(_):
            zero = {k: jnp.zeros((), jnp.float32) for k in _GEN_METRIC_KEYS}
            return state.gen_params, state.gen_opt_state, zero

        if cfg.n_critic == 1:
            gen_params, gen_opt_state, g_metrics = run_g(None)
        else:
            gen_params, gen_opt_state, g_metrics = jax.lax.cond(
                (step + 1) % cfg.n_critic == 0, run_g, skip_g, None)

        # EMA every iteration (train.py:108-109)
        new_state = state.replace(
            step=step + 1,
            gen_params=gen_params,
            dis_params=dis_params,
            gen_opt_state=gen_opt_state,
            dis_opt_state=dis_opt_state,
            ema_gen_params=ema_update(gen_params, state.ema_gen_params),
            ema_dis_params=ema_update(dis_params, state.ema_dis_params),
        )
        metrics = {**d_metrics, **g_metrics, "lr": lr}
        return new_state, metrics

    return train_step_shared if share_forward else train_step


_GEN_METRIC_KEYS = (
    "loss_gen_total", "loss_gen_adv", "loss_gen_recon_x",
    "loss_gen_recon_c_real", "loss_gen_recon_c_fake", "loss_gen_recon_c_rand",
    "loss_gen_recon_s_real", "loss_gen_recon_s_fake", "loss_gen_recon_s_rand",
    "loss_gen_cycrecon_x", "loss_kl_x", "loss_kl_trg", "loss_gen_vgg",
    "loss_ds", "ds_w", "grad_gen_norm",
)
