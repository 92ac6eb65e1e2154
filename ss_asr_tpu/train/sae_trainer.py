"""Speech-autoencoder training that also updates the ASR listener.

Reference SAETrainer (src/trainer.py:760-907): smooth-L1 reconstruction of the
input fbank from [global conv encoding | listener frames]; the optimizer spans
the SAE plus the ASR encoder.  Loss follows the reference's pad-up/truncate-
down alignment: compare over the first max(x_lens) frames (zeros beyond each
sample's own length included, as there).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

from ss_asr_tpu.data.asr_dataset import ASRDataset
from ss_asr_tpu.models import las, speech_autoencoder as sae_mod
from ss_asr_tpu.train import losses
from ss_asr_tpu.train.optim import make_optimizer, prefix_mask
from ss_asr_tpu.train.solver import Solver
from ss_asr_tpu.utils import checkpoint as ckpt


class SAETrainer(Solver):
    def __init__(self, config, paras):
        super().__init__(config, paras, "sae")

    def load_data(self):
        c = self.config["sae"]
        tb, lb = c.get("t_bucket", 128), c.get("l_bucket", 16)
        self.train_ds = ASRDataset(c["train_index"], batch_size=self.train_batch_size,
                                   t_bucket=tb, l_bucket=lb, host_shard=self.host_shard)
        self.valid_ds = ASRDataset(c["valid_index"], batch_size=self.valid_batch_size, t_bucket=tb, l_bucket=lb)
        self.mapper = self.train_ds.mapper

    def set_model(self, asrpath=None):
        self.asrpath_in, self.asrpath_out = self.genpath(asrpath, "asr")
        self.asr_cfg = las.ASRConfig.from_dict(self.config["asr"]["mdl"])
        self.sae_cfg = sae_mod.SAEConfig.from_dict(
            {
                **self.config["sae"]["mdl"],
                "feature_dim": self.asr_cfg.feature_dim,
                "listener_out_dim": self.asr_cfg.enc_out_dim,
            }
        )

        asr_params = self.setup_params(lambda k: las.init_asr(k, self.asr_cfg), self.asrpath_in)
        if ckpt.exists_auto(self.ckppath):
            self.verbose(f"Loading a pretrained model from {self.ckppath}")
            loaded = ckpt.load_auto(self.ckppath)
            sae_params = jax.tree.map(jnp.asarray, loaded["params"])
            self.bn_state = jax.tree.map(jnp.asarray, loaded["bn_state"])
            self.loaded_ckpt = True
        else:
            self.verbose(f"No model found at {self.ckppath}. A new model will be created")
            sae_params, self.bn_state = sae_mod.init_sae(self.next_key(), self.sae_cfg)
            # optimizer-state restore must key on the SAE's OWN checkpoint,
            # not the ASR relay loaded by setup_params above
            self.loaded_ckpt = False
        self.params = {"asr": asr_params, "sae": sae_params}

        mask = prefix_mask(self.params, (("sae",), ("asr", "encoder")))
        c = self.config["sae"]["opt"]
        # Optional damping of the listener co-update (sae.listener_lr_scale,
        # default 1.0 = reference parity). Reconstruction pressure on the
        # bounded LSTM outputs (fbank targets span ~[-14, +4] vs h in [-1, 1])
        # can tanh-saturate the listener when the SAE stage is over-trained,
        # which kills gradients through it and poisons downstream ASR
        # fine-tuning — see docs/GAIN_AB.json for the controlled experiment.
        lr_scale = float(self.config["sae"].get("listener_lr_scale", 1.0))
        scales = None
        if lr_scale != 1.0:
            enc_mask = prefix_mask(self.params, (("asr", "encoder"),))
            scales = [(enc_mask, lr_scale)]
        self.optim = make_optimizer(c["type"], c["learning_rate"], mask=mask,
                                    accum_steps=c.get("accum_steps", 1),
                                    warmup_steps=c.get("warmup_steps", 0),
                                    decay_steps=c.get("decay_steps", 0),
                                    end_scale=c.get("end_scale", 0.0),
                                    update_scales=scales)
        self.opt_state = self.setup_opt_state(self.optim, self.params)

        asr_cfg, sae_cfg, optim = self.asr_cfg, self.sae_cfg, self.optim
        # SAE backprops through the shared listener: wide encoders need the
        # raised scoped-VMEM limit for the fused LSTM backward kernels
        from ss_asr_tpu.ops import rnn as _rnn

        copts = _rnn.wide_h_compiler_options(asr_cfg.encoder_state_size)

        def recon_loss(params, bn_state, x, x_lens, train):
            listener_out, enc_lens = las.listener_apply(params["asr"]["encoder"], x, x_lens)
            recon, new_bn = sae_mod.sae_forward(
                params["sae"], bn_state, sae_cfg, x, listener_out, train=train
            )
            T = x.shape[1]
            recon = recon[:, :T, :]
            # pad recon up to T if the listener dropped odd frames (T not /8)
            pad = T - recon.shape[1]
            if pad > 0:
                recon = jnp.pad(recon, ((0, 0), (0, pad), (0, 0)))
            t_valid = jnp.max(x_lens)
            # listener-saturation telemetry: fraction of valid encoder
            # activations with |h| > 0.99 — the early-warning signal for the
            # co-update poisoning the listener (tanh saturation = no gradient)
            valid = (
                jnp.arange(listener_out.shape[1])[None, :]
                < jnp.maximum(enc_lens, 1)[:, None]
            )[..., None]
            sat = jnp.sum((jnp.abs(listener_out) > 0.99) * valid) / jnp.maximum(
                jnp.sum(valid) * listener_out.shape[-1], 1
            )
            return losses.masked_smooth_l1_mean(recon, x, t_valid), (recon, new_bn, sat)

        if self.mesh is not None:
            assert self.n_model == 1, (
                "parallel.n_model > 1 (tensor parallelism) is supported by "
                "the ASR trainer; this model is too small to shard"
            )
            # DP: grads and fresh BN statistics pmean-ed over the data axis
            # (sync-BN semantics), optimizer replicated
            from jax import lax, shard_map
            from jax.sharding import PartitionSpec as P

            from ss_asr_tpu.parallel import mesh as pmesh

            D = pmesh.DATA_AXIS

            def local_train(params, opt_state, bn_state, x, x_lens):
                (loss, (_, new_bn, sat)), grads = jax.value_and_grad(
                    lambda p: recon_loss(p, bn_state, x, x_lens, True), has_aux=True
                )(params)
                loss = lax.pmean(loss, D)
                sat = lax.pmean(sat, D)
                grads = jax.tree.map(lambda g: lax.pmean(g, D), grads)
                new_bn = jax.tree.map(lambda s: lax.pmean(s, D), new_bn)
                updates, opt_state = optim.update(grads, opt_state, params)
                params = jax.tree.map(lambda a, u: a + u, params, updates)
                return params, opt_state, new_bn, loss, sat

            def local_valid(params, bn_state, x, x_lens):
                loss, (recon, _, sat) = recon_loss(params, bn_state, x, x_lens, False)
                return lax.pmean(loss, D), recon, lax.pmean(sat, D)

            train_sharded = shard_map(
                local_train, mesh=self.mesh,
                in_specs=(P(), P(), P(), P(D), P(D)),
                out_specs=(P(), P(), P(), P(), P()),
                check_vma=False,
            )
            self._train_step = jax.jit(train_sharded, donate_argnums=(0, 1, 2),
                                       compiler_options=copts)
            self._valid_step = jax.jit(shard_map(
                local_valid, mesh=self.mesh,
                in_specs=(P(), P(), P(D), P(D)),
                out_specs=(P(), P(D), P()),
                check_vma=False,
            ), compiler_options=copts)
            self.params = self.place_replicated(self.params)
            self.opt_state = self.place_replicated(self.opt_state)
            self.bn_state = self.place_replicated(self.bn_state)
        else:

            @functools.partial(jax.jit, donate_argnums=(0, 1, 2),
                               compiler_options=copts)
            def train_step(params, opt_state, bn_state, x, x_lens):
                (loss, (_, new_bn, sat)), grads = jax.value_and_grad(
                    lambda p: recon_loss(p, bn_state, x, x_lens, True), has_aux=True
                )(params)
                updates, opt_state = optim.update(grads, opt_state, params)
                params = jax.tree.map(lambda a, u: a + u, params, updates)
                return params, opt_state, new_bn, loss, sat

            @functools.partial(jax.jit, compiler_options=copts)
            def valid_step(params, bn_state, x, x_lens):
                loss, (recon, _, sat) = recon_loss(params, bn_state, x, x_lens, False)
                return loss, recon, sat

            self._train_step = train_step
            self._valid_step = valid_step

    def exec(self):
        self.verbose(f"Training set total {len(self.train_ds)} batches.")
        # saturation-guard cadence: the seed-pipeline SAE stages run far
        # fewer steps than a typical logging_step (e.g. 84 steps vs 250),
        # so a logging-gated check never fires in exactly the short-stage
        # regime where the co-update can collapse the listener (hard-corpus
        # seeds 4-5: undamped m5 greedy WER 0.93 vs m2 0.54). Check at
        # least once per epoch.
        sat_every = max(min(self.logging_step, len(self.train_ds)), 1)
        for epoch in range(self.n_epochs):
            self.verbose(f"Starting epoch {epoch + 1} out of {self.n_epochs}")
            # multi-host: rotate the host shard (no row stranded by the step
            # cap forever), then agree on the number of collective steps
            self.train_ds.set_epoch(epoch)
            n_steps = self.global_min_batches(len(self.train_ds))
            for b_ind, b in enumerate(self.train_ds.iter_batches()):
                if b_ind >= n_steps:
                    break
                self.verbose(
                    f"Batch: {b_ind}/{len(self.train_ds)}, global step: {self.tr.step}",
                    progress=True,
                )
                placed = self.place_batch({"x": b.x, "x_lens": b.x_lens})
                self.params, self.opt_state, self.bn_state, loss, sat = self._train_step(
                    self.params,
                    self.opt_state,
                    self.bn_state,
                    placed["x"],
                    placed["x_lens"],
                )
                if self.tr.step % self.logging_step == 0:
                    self.lg.scalar("train_loss", float(loss), self.tr.step)
                if self.tr.step % sat_every == 0:
                    self.lg.scalar("listener_saturation", float(sat), self.tr.step)
                    self._check_saturation(float(sat))
                if self.tr.step % self.valid_step == 0:
                    self.valid()
                if self.tr.step % self.save_step == 0:
                    self.verbose(f"Model saved at step {self.tr.step}")
                    self._save_sae(self.ckppath)
                    self.save_tree(self.asrpath_out, self.params["asr"])
                    self.save_opt(self.opt_ckppath, self.opt_state)
                self.tr.do_step()

    def _check_saturation(self, sat: float) -> None:
        """One-shot warning when the co-updated listener is saturating —
        past this point downstream ASR fine-tuning degrades sharply
        (docs/GAIN_AB.json). Threshold via sae.saturation_warn (default
        0.005 = ~5x the healthy-training ceiling measured there)."""
        threshold = float(self.config["sae"].get("saturation_warn", 0.005))
        if sat > threshold and not getattr(self, "saturation_warned", False):
            self.saturation_warned = True
            self.verbose(
                f"WARNING: listener saturation {sat:.4f} exceeds "
                f"{threshold} — the SAE co-update is pushing the shared "
                "listener into tanh saturation, which poisons downstream "
                "ASR fine-tuning. Consider sae.listener_lr_scale < 1 "
                "(docs/GAIN_AB.json)"
            )

    def _save_sae(self, path):
        self.save_tree(path, {"params": self.params["sae"], "bn_state": self.bn_state})

    def valid(self):
        avg_loss, avg_sat, n = 0.0, 0.0, 0
        recon = b = None
        for b_idx, b in enumerate(self.valid_ds.iter_batches(drop_last=False)):
            self.verbose(
                f"Validation step - {self.tr.step} ( {b_idx} / {self.valid_ds.num_batches(drop_last=False)} )",
                progress=True,
            )
            placed = self.place_batch({"x": b.x, "x_lens": b.x_lens})
            loss, recon, sat = self._valid_step(
                self.params, self.bn_state, placed["x"], placed["x_lens"]
            )
            avg_loss += float(loss)
            avg_sat += float(sat)
            n += 1
        avg_loss /= max(n, 1)
        avg_sat /= max(n, 1)

        # spectrogram reconstruction comparisons for the last batch
        if recon is not None:
            r = self.to_local(recon)
            for i in range(min(2, r.shape[0])):
                ln = int(b.x_lens[i])
                both = np.stack([b.x[i, :ln].T, r[i, :ln].T])  # [2, F, T]
                self.lg.image(f"encode_compare_{i}", both, self.tr.step)

        self.lg.scalar("eval_loss", avg_loss, self.tr.step)
        self.lg.scalar("eval_listener_saturation", avg_sat, self.tr.step)
        if avg_loss < self.tr.get_best():
            self.tr.set_best(avg_loss)
            self.verbose(f"Best validation loss : {avg_loss:.4f} @ global step {self.tr.step}")
            self._save_sae(self.best_ckppath)
        else:
            self.verbose(
                f"Validation metric worse : ({avg_loss:.4f} vs. {self.tr.get_best():.4f})"
            )

    def close(self):
        self.verbose(
            f"Finished training! Saving most recent model at step {self.tr.step} plus the ASR"
        )
        self._save_sae(self.ckppath)
        self.save_tree(self.asrpath_out, self.params["asr"])
        self.save_opt(self.opt_ckppath, self.opt_state)
        self.lg.close()
