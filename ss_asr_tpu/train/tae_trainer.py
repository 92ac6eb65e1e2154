"""Text-autoencoder training that also updates shared ASR subtrees.

Reference TAETrainer (src/trainer.py:594-758): the optimizer spans the whole
TAE plus the ASR's embed/attention/speller/char_trans; both the TAE and the
mutated ASR are checkpointed.  Here the two models live in one param tree
``{"asr": ..., "tae": ...}`` and the update is masked to exactly those
subtrees — the listener provably receives no update.

Quirk preserved: the reference compares decode-step-t logits against y[t]
(unshifted — unlike the ASR trainer's y[t+1]), with position 0 neutralized by
ignore_index=0 (src/trainer.py:665-676).
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

from ss_asr_tpu.data.asr_dataset import ASRDataset
from ss_asr_tpu.models import las, text_autoencoder as tae_mod
from ss_asr_tpu.train import losses
from ss_asr_tpu.train.optim import make_optimizer, prefix_mask
from ss_asr_tpu.train.solver import Solver

#: ASR subtrees the TAE trainer updates (reference trainer.py:634-641)
SHARED_ASR_SUBTREES = (("asr", "embed"), ("asr", "attention"), ("asr", "decoder"), ("asr", "char_trans"))


class TAETrainer(Solver):
    def __init__(self, config, paras):
        super().__init__(config, paras, "tae")

    def load_data(self):
        c = self.config["tae"]
        lb = c.get("l_bucket", 16)
        self.train_ds = ASRDataset(
            c["train_index"],
            batch_size=self.train_batch_size,
            text_only=True,
            drop_rate=c["drop_rate"],
            l_bucket=lb,
            host_shard=self.host_shard,
        )
        self.valid_ds = ASRDataset(
            c["valid_index"],
            batch_size=self.valid_batch_size,
            text_only=True,
            drop_rate=c["drop_rate"],
            l_bucket=lb,
        )
        self.mapper = self.train_ds.mapper

    def set_model(self, asrpath=None):
        self.asrpath_in, self.asrpath_out = self.genpath(asrpath, "asr")
        self.asr_cfg = las.ASRConfig.from_dict(self.config["asr"]["mdl"])
        self.tae_cfg = tae_mod.TAEConfig.from_dict(self.config["tae"]["mdl"])

        asr_params = self.setup_params(lambda k: las.init_asr(k, self.asr_cfg), self.asrpath_in)
        tae_params = self.setup_params(lambda k: tae_mod.init_tae(k, self.tae_cfg), self.ckppath)
        self.params = {"asr": asr_params, "tae": tae_params}

        mask = prefix_mask(self.params, (("tae",),) + SHARED_ASR_SUBTREES)
        c = self.config["tae"]["opt"]
        self.optim = make_optimizer(c["type"], c["learning_rate"], mask=mask,
                                    accum_steps=c.get("accum_steps", 1),
                                    warmup_steps=c.get("warmup_steps", 0),
                                    decay_steps=c.get("decay_steps", 0),
                                    end_scale=c.get("end_scale", 0.0))
        self.opt_state = self.setup_opt_state(self.optim, self.params)

        asr_cfg, tae_cfg, optim = self.asr_cfg, self.tae_cfg, self.optim
        # TAE trains THROUGH the shared speller/attention, so wide decoders
        # need the same raised scoped-VMEM limit as supervised training
        from ss_asr_tpu.ops import rnn as _rnn

        copts = _rnn.wide_h_compiler_options(
            max(asr_cfg.encoder_state_size, asr_cfg.decoder_state_size,
                tae_cfg.state_size),
            spell_h=asr_cfg.decoder_state_size)

        def loss_of(params, y, y_noised, noise_lens, key):
            decode_step = y.shape[1]
            teacher = jnp.pad(y, ((0, 0), (0, 1)))  # pad col so teacher[t+1] exists
            _, logits = tae_mod.tae_forward(
                params["asr"], params["tae"], asr_cfg, tae_cfg,
                teacher, y_noised, noise_lens, decode_step, key,
            )
            return losses.masked_ce_per_utt(logits, y, y), logits

        def local_grads(params, y, y_noised, noise_lens, key):
            (loss, logits), grads = jax.value_and_grad(
                lambda p: loss_of(p, y, y_noised, noise_lens, key), has_aux=True
            )(params)
            return loss, grads, logits

        if self.mesh is not None:
            assert self.n_model == 1, (
                "parallel.n_model > 1 (tensor parallelism) is supported by "
                "the ASR trainer; this model is too small to shard"
            )
            from ss_asr_tpu.parallel import mesh as pmesh
            from jax import lax
            from jax.sharding import PartitionSpec as P

            def local_valid(params, y, y_noised, noise_lens, key):
                loss, logits = loss_of(params, y, y_noised, noise_lens, key)
                return lax.pmean(loss, pmesh.DATA_AXIS), logits

            self._train_step = pmesh.dp_train_step(
                self.mesh, local_grads, optim, n_batch_args=3,
                compiler_options=copts
            )
            self._valid_step = pmesh.dp_eval_step(
                self.mesh, local_valid, n_batch_args=3, n_rep_args=1,
                out_specs=(P(), P(pmesh.DATA_AXIS)),
                compiler_options=copts,
            )
            self.params = self.place_replicated(self.params)
            self.opt_state = self.place_replicated(self.opt_state)
        else:

            @functools.partial(jax.jit, donate_argnums=(0, 1),
                               compiler_options=copts)
            def train_step(params, opt_state, y, y_noised, noise_lens, key):
                loss, grads, logits = local_grads(params, y, y_noised, noise_lens, key)
                updates, opt_state = optim.update(grads, opt_state, params)
                params = jax.tree.map(lambda a, u: a + u, params, updates)
                return params, opt_state, loss, logits

            @functools.partial(jax.jit, compiler_options=copts)
            def valid_step(params, y, y_noised, noise_lens, key):
                return loss_of(params, y, y_noised, noise_lens, key)

            self._train_step = train_step
            self._valid_step = valid_step

    def exec(self):
        self.verbose(f"Training set total {len(self.train_ds)} batches")
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
                placed = self.place_batch(
                    {"y": b.y, "yn": b.y_noised, "nl": b.y_noised_lens}
                )
                self.params, self.opt_state, loss, _ = self._train_step(
                    self.params,
                    self.opt_state,
                    placed["y"],
                    placed["yn"],
                    placed["nl"],
                    self.place_replicated(self.next_key()),
                )
                if self.tr.step % self.logging_step == 0:
                    self.lg.scalar("train_loss", float(loss), self.tr.step)
                if self.tr.step % self.valid_step == 0:
                    self.valid()
                if self.tr.step % self.save_step == 0:
                    self.verbose(f"Model saved at step {self.tr.step}")
                    self.save_tree(self.ckppath, self.params["tae"])
                    self.save_tree(self.asrpath_out, self.params["asr"])
                    self.save_opt(self.opt_ckppath, self.opt_state)
                self.tr.do_step()

    def valid(self):
        avg_loss, n = 0.0, 0
        logits = b = None
        for b_idx, b in enumerate(self.valid_ds.iter_batches(drop_last=False)):
            self.verbose(f"Validation step -( {b_idx} / {self.valid_ds.num_batches(drop_last=False)} )", progress=True)
            placed = self.place_batch(
                {"y": b.y, "yn": b.y_noised, "nl": b.y_noised_lens}
            )
            loss, logits = self._valid_step(
                self.params,
                placed["y"],
                placed["yn"],
                placed["nl"],
                self.place_replicated(self.next_key()),
            )
            avg_loss += float(loss)
            n += 1
        avg_loss /= max(n, 1)

        if logits is not None:
            labels = [self.mapper.translate(l) for l in b.y]
            predicts = [self.mapper.translate(p) for p in np.argmax(self.to_local(logits), axis=-1)]
            for i in range(min(4, len(labels))):
                self.lg.text(f"eval_text{i}", f"{labels[i]} |vs.| {predicts[i]}", self.tr.step)

        self.lg.scalar("eval_loss", avg_loss, self.tr.step)
        if avg_loss < self.tr.get_best():
            self.tr.set_best(avg_loss)
            self.verbose(f"Best validation loss : {avg_loss:.4f} @ global step {self.tr.step}")
            self.save_tree(self.best_ckppath, self.params["tae"])
            self.verbose("Both the text autoencoder and ASR have been saved")
        else:
            self.verbose(
                f"Validation metric worse : ({avg_loss:.4f} vs. {self.tr.get_best():.4f})"
            )

    def close(self):
        self.verbose(
            f"Finished training! Saving most recent model at step {self.tr.step} plus the ASR"
        )
        self.save_tree(self.ckppath, self.params["tae"])
        self.save_tree(self.asrpath_out, self.params["asr"])
        self.save_opt(self.opt_ckppath, self.opt_state)
        self.lg.close()
