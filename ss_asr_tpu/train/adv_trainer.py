"""Adversarial (GAN-style) listener training.

Reference ADVTrainer (src/trainer.py:909-1124): D = per-timestep MLP
discriminator, G = the ASR listener, "real" data = the text-autoencoder's
TextEncoder output on transcripts.  Classic two-step update:

* D-step: BCE(D(text_enc(y)), 1 - label_smoothing) + BCE(D(stop_grad(
  listener(x))), 0), updating the discriminator only.
* G-step: BCE(D(listener(x)), 1), updating the listener only.

The reference's undefined ``self.loss_metric`` (its defect #4) is BCE here.
Both optimizers are masked subtree updates over one shared param tree
``{"asr", "tae", "disc"}``; stop_gradient replaces ``.detach()``
(src/trainer.py:988-991).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ss_asr_tpu.data.asr_dataset import ASRDataset
from ss_asr_tpu.models import discriminator as disc_mod
from ss_asr_tpu.models import las, text_autoencoder as tae_mod
from ss_asr_tpu.train import losses
from ss_asr_tpu.train.optim import make_optimizer, prefix_mask
from ss_asr_tpu.train.solver import Solver
from ss_asr_tpu.utils import checkpoint as ckpt


class ADVTrainer(Solver):
    def __init__(self, config, paras):
        super().__init__(config, paras, "adv")

    def load_data(self):
        c = self.config["adv"]
        tb, lb = c.get("t_bucket", 128), c.get("l_bucket", 16)
        self.train_ds = ASRDataset(c["train_index"], batch_size=self.train_batch_size,
                                   t_bucket=tb, l_bucket=lb, host_shard=self.host_shard)
        # defect #4 fix: the reference reads adv.eval_index which is absent
        # from its own config; accept either key
        eval_index = c.get("eval_index", c.get("valid_index"))
        self.valid_ds = ASRDataset(eval_index, batch_size=self.valid_batch_size, t_bucket=tb, l_bucket=lb)
        self.mapper = self.train_ds.mapper

    def set_model(self, asrpath=None, taepath=None):
        self.asrpath_in, self.asrpath_out = self.genpath(asrpath, "asr")
        taepath_in, _ = self.genpath(taepath, "tae")

        self.asr_cfg = las.ASRConfig.from_dict(self.config["asr"]["mdl"])
        self.tae_cfg = tae_mod.TAEConfig.from_dict(self.config["tae"]["mdl"])
        self.disc_cfg = disc_mod.DiscriminatorConfig.from_dict(
            {**self.config["adv"]["mdl"], "in_dim": self.asr_cfg.enc_out_dim}
        )
        self.label_smoothing = self.config["adv"].get("label_smoothing", 0.1)

        self.params = {
            "asr": self.setup_params(lambda k: las.init_asr(k, self.asr_cfg), self.asrpath_in),
            "tae": self.setup_params(lambda k: tae_mod.init_tae(k, self.tae_cfg), taepath_in),
            "disc": self.setup_params(
                lambda k: disc_mod.init_discriminator(k, self.disc_cfg), self.ckppath
            ),
        }

        g = self.config["adv"]["G_opt"]
        d = self.config["adv"]["D_opt"]
        self.G_optim = make_optimizer(
            g["type"], g["learning_rate"],
            mask=prefix_mask(self.params, (("asr", "encoder"),)),
            accum_steps=g.get("accum_steps", 1),
            warmup_steps=g.get("warmup_steps", 0),
            decay_steps=g.get("decay_steps", 0),
            end_scale=g.get("end_scale", 0.0),
        )
        self.D_optim = make_optimizer(
            d["type"], d["learning_rate"],
            mask=prefix_mask(self.params, (("disc",),)),
            accum_steps=d.get("accum_steps", 1),
            warmup_steps=d.get("warmup_steps", 0),
            decay_steps=d.get("decay_steps", 0),
            end_scale=d.get("end_scale", 0.0),
        )
        self.G_state = self.G_optim.init(self.params)
        self.D_state = self.D_optim.init(self.params)
        # built from ckpdir+module_id directly — str.replace on the full path
        # would also rewrite '_opt' occurrences in directory names
        import os

        self.g_opt_ckppath = os.path.join(self.ckpdir, "adv_G_opt.npz")
        self.d_opt_ckppath = os.path.join(self.ckpdir, "adv_D_opt.npz")
        if getattr(self, "loaded_ckpt", False):
            if ckpt.exists(self.g_opt_ckppath):
                self.G_state = ckpt.load_opt_state(self.g_opt_ckppath, self.G_state)
            if ckpt.exists(self.d_opt_ckppath):
                self.D_state = ckpt.load_opt_state(self.d_opt_ckppath, self.D_state)

        tae_cfg, smoothing = self.tae_cfg, self.label_smoothing
        # the G-step backprops through the shared listener: wide encoders
        # need the raised scoped-VMEM limit for the LSTM backward kernels
        from ss_asr_tpu.ops import rnn as _rnn

        copts = _rnn.wide_h_compiler_options(
            max(self.asr_cfg.encoder_state_size, tae_cfg.state_size))
        G_optim, D_optim = self.G_optim, self.D_optim

        def d_losses(params, x, x_lens, y, y_lens, smooth):
            real = tae_mod.text_encode(params["tae"]["encoder"], tae_cfg, y, y_lens)
            d_real = disc_mod.discriminate(params["disc"], real)
            real_loss = losses.bce(d_real, jnp.full_like(d_real, 1.0 - smooth))
            fake = jax.lax.stop_gradient(
                las.listener_apply(params["asr"]["encoder"], x, x_lens)[0]
            )
            d_fake = disc_mod.discriminate(params["disc"], fake)
            fake_loss = losses.bce(d_fake, jnp.zeros_like(d_fake))
            return real_loss, fake_loss, real, fake

        def d_local(params, d_state, x, x_lens, y, y_lens):
            def loss_fn(p):
                rl, fl, _, _ = d_losses(p, x, x_lens, y, y_lens, smoothing)
                return rl + fl, (rl, fl)

            (loss, (rl, fl)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            return grads, d_state, rl, fl

        def g_local(params, g_state, x, x_lens):
            def loss_fn(p):
                fake, _ = las.listener_apply(p["asr"]["encoder"], x, x_lens)
                d_out = disc_mod.discriminate(p["disc"], fake)
                return losses.bce(d_out, jnp.ones_like(d_out))

            loss, grads = jax.value_and_grad(loss_fn)(params)
            return grads, g_state, loss

        if self.mesh is not None:
            assert self.n_model == 1, (
                "parallel.n_model > 1 (tensor parallelism) is supported by "
                "the ASR trainer; this model is too small to shard"
            )
            from jax import lax, shard_map
            from jax.sharding import PartitionSpec as P

            from ss_asr_tpu.parallel import mesh as pmesh

            D = pmesh.DATA_AXIS

            def d_step_local(params, d_state, x, x_lens, y, y_lens):
                grads, d_state, rl, fl = d_local(params, d_state, x, x_lens, y, y_lens)
                grads = jax.tree.map(lambda g: lax.pmean(g, D), grads)
                rl, fl = lax.pmean(rl, D), lax.pmean(fl, D)
                updates, d_state = D_optim.update(grads, d_state, params)
                params = jax.tree.map(lambda a, u: a + u, params, updates)
                return params, d_state, rl, fl

            def g_step_local(params, g_state, x, x_lens):
                grads, g_state, loss = g_local(params, g_state, x, x_lens)
                grads = jax.tree.map(lambda g: lax.pmean(g, D), grads)
                loss = lax.pmean(loss, D)
                updates, g_state = G_optim.update(grads, g_state, params)
                params = jax.tree.map(lambda a, u: a + u, params, updates)
                return params, g_state, loss

            def valid_local(params, x, x_lens, y, y_lens):
                rl, fl, real, fake = d_losses(params, x, x_lens, y, y_lens, 0.0)
                return lax.pmean(rl, D), lax.pmean(fl, D), real, fake

            self._d_step = jax.jit(shard_map(
                d_step_local, mesh=self.mesh,
                in_specs=(P(), P(), P(D), P(D), P(D), P(D)),
                out_specs=(P(), P(), P(), P()), check_vma=False,
            ), donate_argnums=(1,), compiler_options=copts)
            self._g_step = jax.jit(shard_map(
                g_step_local, mesh=self.mesh,
                in_specs=(P(), P(), P(D), P(D)),
                out_specs=(P(), P(), P()), check_vma=False,
            ), donate_argnums=(1,), compiler_options=copts)
            self._valid_step = jax.jit(shard_map(
                valid_local, mesh=self.mesh,
                in_specs=(P(), P(D), P(D), P(D), P(D)),
                out_specs=(P(), P(), P(D), P(D)), check_vma=False,
            ), compiler_options=copts)
            self.params = self.place_replicated(self.params)
            self.G_state = self.place_replicated(self.G_state)
            self.D_state = self.place_replicated(self.D_state)
        else:

            @functools.partial(jax.jit, compiler_options=copts)
            def d_step(params, d_state, x, x_lens, y, y_lens):
                grads, d_state, rl, fl = d_local(params, d_state, x, x_lens, y, y_lens)
                updates, d_state = D_optim.update(grads, d_state, params)
                params = jax.tree.map(lambda a, u: a + u, params, updates)
                return params, d_state, rl, fl

            @functools.partial(jax.jit, compiler_options=copts)
            def g_step(params, g_state, x, x_lens):
                grads, g_state, loss = g_local(params, g_state, x, x_lens)
                updates, g_state = G_optim.update(grads, g_state, params)
                params = jax.tree.map(lambda a, u: a + u, params, updates)
                return params, g_state, loss

            @functools.partial(jax.jit, compiler_options=copts)
            def valid_step(params, x, x_lens, y, y_lens):
                rl, fl, real, fake = d_losses(params, x, x_lens, y, y_lens, 0.0)
                return rl, fl, real, fake

            self._d_step, self._g_step, self._valid_step = d_step, g_step, valid_step

    def exec(self):
        self.verbose(f"Training set total {len(self.train_ds)} batches")
        for epoch in range(self.n_epochs):
            self.verbose(f"Starting epoch {epoch + 1} out of {self.n_epochs}")
            # multi-host: rotate the host shard (no row stranded by the step
            # cap forever), then agree on the number of collective steps
            self.train_ds.set_epoch(epoch)
            n_steps = self.global_min_batches(len(self.train_ds))
            for b_idx, b in enumerate(self.train_ds.iter_batches()):
                if b_idx >= n_steps:
                    break
                self.verbose(
                    f"Global step - {self.tr.step} ( {b_idx} / {len(self.train_ds)} )",
                    progress=True,
                )
                placed = self.place_batch(
                    {"x": b.x, "xl": b.x_lens, "y": b.y, "yl": b.y_lens}
                )
                x, xl, y, yl = placed["x"], placed["xl"], placed["y"], placed["yl"]
                self.params, self.D_state, rl, fl = self._d_step(
                    self.params, self.D_state, x, xl, y, yl
                )
                self.params, self.G_state, gl = self._g_step(self.params, self.G_state, x, xl)

                if self.tr.step % self.logging_step == 0:
                    self.lg.scalar("discrim_real_loss_train", float(rl), self.tr.step)
                    self.lg.scalar("discrim_fake_loss_train", float(fl), self.tr.step)
                    self.lg.scalar("discrim_loss_train", float(rl) + float(fl), self.tr.step)
                    self.lg.scalar("gen_loss_train", float(gl), self.tr.step)
                if self.tr.step % self.valid_step == 0:
                    self.valid()
                if self.tr.step % self.save_step == 0:
                    self.verbose(f"Model saved at step {self.tr.step}")
                    self._save_all()
                self.tr.do_step()

    def valid(self):
        avg_real, avg_fake, n = 0.0, 0.0, 0
        real = fake = None
        for b_idx, b in enumerate(self.valid_ds.iter_batches(drop_last=False)):
            self.verbose(
                f"Validation step - {self.tr.step} ( {b_idx} / {self.valid_ds.num_batches(drop_last=False)} )",
                progress=True,
            )
            placed = self.place_batch(
                {"x": b.x, "xl": b.x_lens, "y": b.y, "yl": b.y_lens}
            )
            rl, fl, real, fake = self._valid_step(
                self.params, placed["x"], placed["xl"], placed["y"], placed["yl"]
            )
            avg_real += float(rl)
            avg_fake += float(fl)
            n += 1
        avg_real /= max(n, 1)
        avg_fake /= max(n, 1)

        if real is not None:
            # whole-batch projector: every per-timestep embedding of the last
            # validation batch, real and fake. The reference ships sample 0
            # only (src/trainer.py:1093-1094) but its dead whole-batch
            # flatten at trainer.py:1074 shows the intent — restored here.
            r = self.to_local(real)  # [B, S, D]
            f = self.to_local(fake)  # [B, T/8, D]
            embs = np.concatenate(
                [r.reshape(-1, r.shape[-1]), f.reshape(-1, f.shape[-1])]
            )
            meta = ["real"] * (r.shape[0] * r.shape[1]) + (
                ["fake"] * (f.shape[0] * f.shape[1])
            )
            self.lg.embedding("validation_emb", embs, meta, self.tr.step)

        avg_loss = avg_real + avg_fake
        self.lg.scalar("discrim_real_loss_eval", avg_real, self.tr.step)
        self.lg.scalar("discrim_fake_loss_eval", avg_fake, self.tr.step)
        self.lg.scalar("discrim_loss_eval", avg_loss, self.tr.step)

        if avg_loss < self.tr.get_best():
            self.tr.set_best(avg_loss)
            self.verbose(f"Best validation loss : {avg_loss:.4f} @ global step {self.tr.step}")
            self.save_tree(self.best_ckppath, self.params["disc"])
            self.verbose("Both the discriminator and ASR have been saved")

    def _save_all(self):
        self.save_tree(self.ckppath, self.params["disc"])
        self.save_tree(self.asrpath_out, self.params["asr"])
        self.save_opt(self.g_opt_ckppath, self.G_state)
        self.save_opt(self.d_opt_ckppath, self.D_state)

    def close(self):
        self.verbose(
            f"Finished training! Saving most recent model at step {self.tr.step} plus the ASR"
        )
        self._save_all()
        self.lg.close()
