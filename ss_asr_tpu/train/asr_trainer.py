"""Supervised LAS training (reference ASRTrainer, src/trainer.py:374-545)."""

from __future__ import annotations

import functools
import os

import jax
import numpy as np

from ss_asr_tpu.data.asr_dataset import ASRDataset
from ss_asr_tpu.models import las
from ss_asr_tpu.train import losses
from ss_asr_tpu.train.optim import make_optimizer
from ss_asr_tpu.train.solver import Solver
from ss_asr_tpu.utils.metrics import calc_acc, calc_cer, calc_err, draw_att
from ss_asr_tpu.utils.profiling import StepTimer


class ASRTrainer(Solver):
    def __init__(self, config, paras):
        super().__init__(config, paras, "asr")

    # ------------------------------------------------------------------
    def load_data(self):
        c = self.config["asr"]
        tb, lb = c.get("t_bucket", 128), c.get("l_bucket", 16)
        # training shards per host; validation stays whole-corpus on every
        # host so eval metrics agree across processes
        self.train_ds = ASRDataset(c["train_index"], batch_size=self.train_batch_size,
                                   t_bucket=tb, l_bucket=lb, host_shard=self.host_shard)
        self.valid_ds = ASRDataset(c["valid_index"], batch_size=self.valid_batch_size, t_bucket=tb, l_bucket=lb)
        self.mapper = self.train_ds.mapper
        self.wer_step = c.get("wer_step", 50)

    # ------------------------------------------------------------------
    def set_model(self):
        c = self.config["asr"]
        self.cfg = las.ASRConfig.from_dict(c["mdl"])
        self.params = self.setup_params(lambda k: las.init_asr(k, self.cfg), self.ckppath)
        self.optim = make_optimizer(c["opt"]["type"], c["opt"]["learning_rate"],
                                    accum_steps=c["opt"].get("accum_steps", 1),
                                    warmup_steps=c["opt"].get("warmup_steps", 0),
                                    decay_steps=c["opt"].get("decay_steps", 0),
                                    end_scale=c["opt"].get("end_scale", 0.0))
        self.opt_state = self.setup_opt_state(self.optim, self.params)

        cfg = self.cfg
        optim = self.optim
        # optional on-device SpecAugment (train path only; beyond-reference)
        from ss_asr_tpu.ops.augment import SpecAugmentConfig, spec_augment

        aug_cfg = SpecAugmentConfig.from_dict(c.get("augment"))

        def local_grads(params, x, x_lens, y, key):
            """Per-device (or whole-batch) loss+grads; logits as aux."""
            decode_step = y.shape[1] - 1
            if aug_cfg is not None:
                k_aug, key = jax.random.split(key)
                x = spec_augment(k_aug, x, x_lens, aug_cfg)

            def loss_fn(p):
                _, logits, _ = las.asr_forward(
                    p, cfg, x, x_lens, decode_step, teacher=y, key=key
                )
                return losses.masked_ce_per_utt(logits, y[:, 1:], y), logits

            (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            return loss, grads, logits

        def local_valid(params, x, x_lens, y):
            decode_step = y.shape[1] - 1 + 30  # reference's +30 free-run steps
            _, logits, att = las.asr_forward(params, cfg, x, x_lens, decode_step)
            ans_len = y.shape[1] - 1
            per_utt = losses.masked_nll_per_utt(logits[:, :ans_len], y[:, 1:], y)
            return per_utt, logits, att

        # wide recurrences (H > 512) need a raised scoped-VMEM limit for the
        # fused kernels' backward pass (ops/rnn.wide_h_compiler_options)
        from ss_asr_tpu.ops import rnn as _rnn

        copts = _rnn.wide_h_compiler_options(
            max(cfg.encoder_state_size, cfg.decoder_state_size),
            spell_h=cfg.decoder_state_size)

        if self.mesh is not None and self.n_model > 1:
            # (data x model) tensor parallelism via jit+GSPMD: params sharded
            # by the parallel.mesh rules (4H gate / vocab / psi dims over the
            # model axis), batch over the data axis, XLA inserts the
            # collectives. The Pallas LSTM/spell kernels stay fused through
            # their custom_partitioning batch rules (ops/pallas). This is the
            # trainer surface of the dryrun's jit+GSPMD configuration
            # (__graft_entry__._dryrun_gspmd_tp).
            from ss_asr_tpu.parallel import mesh as pmesh

            n_data = self.mesh.shape[pmesh.DATA_AXIS]
            global_batch = self.train_batch_size * jax.process_count()
            assert global_batch % n_data == 0, (
                f"global train batch {global_batch} (= {self.train_batch_size}"
                f" per host x {jax.process_count()} hosts) must divide over "
                f"the {n_data}-device data axis"
            )
            assert self.valid_batch_size * jax.process_count() % n_data == 0

            @functools.partial(jax.jit, donate_argnums=(0, 1),
                               compiler_options=copts)
            def tp_train_step(params, opt_state, x, x_lens, y, key):
                loss, grads, logits = local_grads(params, x, x_lens, y, key)
                updates, opt_state = optim.update(grads, opt_state, params)
                params = jax.tree.map(lambda p, u: p + u, params, updates)
                return params, opt_state, loss, logits

            self._train_step = self.run_in_mesh(tp_train_step)
            self._valid_step = self.run_in_mesh(
                jax.jit(local_valid, compiler_options=copts))
            self.params = self.place_tp(self.params)
            self.opt_state = self.place_tp(self.opt_state)
        elif self.mesh is not None:
            # data-parallel over ICI: one shard_map(train step) inside jit;
            # grads pmean-ed, optimizer replicated (parallel/mesh.py)
            from ss_asr_tpu.parallel import mesh as pmesh

            n_data = self.mesh.shape[pmesh.DATA_AXIS]
            global_batch = self.train_batch_size * jax.process_count()
            assert global_batch % n_data == 0, (
                f"global train batch {global_batch} (= {self.train_batch_size}"
                f" per host x {jax.process_count()} hosts) must divide over "
                f"the {n_data}-device data axis"
            )
            assert self.valid_batch_size * jax.process_count() % n_data == 0
            self._train_step = pmesh.dp_train_step(
                self.mesh, local_grads, optim, n_batch_args=3,
                compiler_options=copts
            )
            self._valid_step = pmesh.dp_eval_step(self.mesh, local_valid, 3,
                                                  compiler_options=copts)
            self.params = self.place_replicated(self.params)
            self.opt_state = self.place_replicated(self.opt_state)
        else:

            @functools.partial(jax.jit, donate_argnums=(0, 1),
                               compiler_options=copts)
            def train_step(params, opt_state, x, x_lens, y, key):
                loss, grads, logits = local_grads(params, x, x_lens, y, key)
                updates, opt_state = optim.update(grads, opt_state, params)
                params = jax.tree.map(lambda p, u: p + u, params, updates)
                return params, opt_state, loss, logits

            self._train_step = train_step
            self._valid_step = jax.jit(local_valid, compiler_options=copts)

    # ------------------------------------------------------------------
    def exec(self):
        self.verbose(f"Training set total {len(self.train_ds)} batches")
        timer = StepTimer()
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
                placed = self.place_batch({"x": b.x, "x_lens": b.x_lens, "y": b.y})
                self.params, self.opt_state, loss, logits = self._train_step(
                    self.params,
                    self.opt_state,
                    placed["x"],
                    placed["x_lens"],
                    placed["y"],
                    self.place_replicated(self.next_key()),
                )
                timer.tick()
                if self.tr.step % self.logging_step == 0:
                    label = b.y[:, 1:]
                    self.lg.scalar("train_loss", float(loss), self.tr.step)
                    self.lg.scalar("train_acc", calc_acc(self.to_local(logits), label), self.tr.step)
                    if timer.steps_per_sec > 0:
                        self.lg.scalar("train_utt_per_sec",
                                       timer.utt_per_sec(b.y.shape[0]), self.tr.step)
                if self.tr.step % self.wer_step == 0:
                    label = b.y[:, 1:]
                    self.lg.scalar(
                        "train_error",
                        calc_err(self.to_local(logits), label, mapper=self.mapper),
                        self.tr.step,
                    )
                if self.tr.step % self.save_step == 0:
                    self.verbose(f"Model saved at step {self.tr.step}")
                    self.save_state(self.params, self.opt_state)
                if self.tr.step % self.valid_step == 0:
                    self.valid()
                self.tr.do_step()

    # ------------------------------------------------------------------
    def valid(self):
        # per-utterance accumulation: every utterance weighs the same
        # regardless of batch fill (the reference normalizes by utterance
        # count too, src/trainer.py:460-537)
        total_loss, total_acc, total_err, total_cer, n = 0.0, 0.0, 0.0, 0.0, 0
        logits = att = label = b = None
        for b_idx, b in enumerate(self.valid_ds.iter_batches(drop_last=False)):
            self.verbose(f"Validation step - ( {b_idx} / {self.valid_ds.num_batches(drop_last=False)} )", progress=True)
            placed = self.place_batch({"x": b.x, "x_lens": b.x_lens, "y": b.y})
            per_utt, logits, att = self._valid_step(
                self.params, placed["x"], placed["x_lens"], placed["y"]
            )
            label = b.y[:, 1:]
            valid = b.valid if b.valid is not None else np.ones(b.y.shape[0], bool)
            n_b = int(valid.sum())
            pu = self.to_local(per_utt)[valid]
            total_loss += float(pu.sum())
            lg = self.to_local(logits)[valid]
            total_acc += calc_acc(lg[:, : label.shape[1]], label[valid]) * n_b
            total_err += calc_err(lg, label[valid], mapper=self.mapper) * n_b
            total_cer += calc_cer(lg, label[valid], mapper=self.mapper) * n_b
            n += n_b

        avg_loss = total_loss / max(n, 1)
        avg_acc = total_acc / max(n, 1)
        avg_err = total_err / max(n, 1)
        self.lg.scalar("eval_loss", avg_loss, self.tr.step)
        self.lg.scalar("eval_error", avg_err, self.tr.step)
        self.lg.scalar("eval_acc", avg_acc, self.tr.step)
        self.lg.scalar("eval_cer", total_cer / max(n, 1), self.tr.step)

        # attention maps + hypotheses for the last batch
        if logits is not None:
            hyp_ids = np.argmax(self.to_local(logits), axis=-1)
            val_hyp = [self.mapper.translate(p) for p in hyp_ids]
            val_txt = [self.mapper.translate(l) for l in label]
            maps = draw_att(self.to_local(att), hyp_ids)
            for idx, attmap in enumerate(maps[:4]):
                self.lg.image(f"eval_att_{idx}", attmap, self.tr.step)
                self.lg.text(
                    f"eval_hyp_{idx}",
                    f"{val_hyp[idx]} |predict vs. real| {val_txt[idx]}",
                    self.tr.step,
                )

        if avg_loss < self.tr.get_best():
            self.tr.set_best(avg_loss)
            self.verbose(
                f"Best validation loss for ASR : {avg_loss:.4f} @ global step {self.tr.step}"
            )
            self.save_tree(self.best_ckppath, self.params)
            if logits is not None:
                with open(os.path.join(self.ckpdir, "best_hyp.txt"), "w") as f:
                    for t1, t2 in zip(val_hyp, val_txt):
                        f.write(f"{t1},{t2}\n")
        else:
            self.verbose(
                f"Validation metric worse : ({avg_loss:.4f} vs. {self.tr.get_best():.4f})"
            )

    def close(self):
        self.verbose(f"Finished training! Saving most recent model at step {self.tr.step}")
        self.save_state(self.params, self.opt_state)
        self.lg.close()
