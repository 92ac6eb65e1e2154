"""Char-LM training (reference CHARLMTrainer, src/trainer.py:197-372)."""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
import numpy as np

from ss_asr_tpu.data.lm_dataset import LMDataset
from ss_asr_tpu.models import charlm
from ss_asr_tpu.train import losses
from ss_asr_tpu.train.optim import make_optimizer
from ss_asr_tpu.train.solver import Solver
from ss_asr_tpu.vocab import Mapper, SOS_TKN


class CHARLMTrainer(Solver):
    def __init__(self, config, paras):
        super().__init__(config, paras, "char_lm")

    def load_data(self):
        c = self.config["char_lm"]
        self.chunk_size = c["chunk_size"]
        self.tf_rate = c["mdl"].get("tf_rate", 0.9)
        self.ds = LMDataset(c["train_index"], self.chunk_size,
                            host_shard=self.host_shard)
        self.mapper = Mapper()

    def set_model(self):
        c = self.config["char_lm"]
        self.cfg = charlm.CharLMConfig.from_dict({**c["mdl"], "tf_rate": self.tf_rate})
        self.params = self.setup_params(
            lambda k: charlm.init_charlm(k, self.cfg), self.ckppath
        )
        self.optim = make_optimizer(c["opt"]["type"], c["opt"]["learning_rate"],
                                    accum_steps=c["opt"].get("accum_steps", 1),
                                    warmup_steps=c["opt"].get("warmup_steps", 0),
                                    decay_steps=c["opt"].get("decay_steps", 0),
                                    end_scale=c["opt"].get("end_scale", 0.0))
        self.opt_state = self.setup_opt_state(self.optim, self.params)
        cfg, optim = self.cfg, self.optim

        def local_grads(params, y, key):
            # reference: input at step 0 is id 0 for the whole batch and the
            # target at step i is y[:, i] (trainer.py:231-239)
            def loss_fn(p):
                logits = charlm.teacher_forced_unroll(p, cfg, y, key)
                return losses.chunk_ce(logits, y), logits

            (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            return loss, grads, logits

        if self.mesh is not None:
            assert self.n_model == 1, (
                "parallel.n_model > 1 (tensor parallelism) is supported by "
                "the ASR trainer; this model is too small to shard"
            )
            # data-parallel chunks over ICI, same wrapper as the other trainers
            from ss_asr_tpu.parallel import mesh as pmesh

            n_data = self.mesh.shape[pmesh.DATA_AXIS]
            global_batch = self.train_batch_size * jax.process_count()
            assert global_batch % n_data == 0, (
                f"global train batch {global_batch} (= {self.train_batch_size}"
                f" per host x {jax.process_count()} hosts) must divide over "
                f"the {n_data}-device data axis"
            )
            self._train_step = pmesh.dp_train_step(
                self.mesh, local_grads, optim, n_batch_args=1
            )
            self.params = self.place_replicated(self.params)
            self.opt_state = self.place_replicated(self.opt_state)
        else:

            @functools.partial(jax.jit, donate_argnums=(0, 1))
            def train_step(params, opt_state, y, key):
                loss, grads, logits = local_grads(params, y, key)
                updates, opt_state = optim.update(grads, opt_state, params)
                params = jax.tree.map(lambda a, u: a + u, params, updates)
                return params, opt_state, loss, logits

            self._train_step = train_step

    def exec(self):
        n_batches = len(self.ds) // self.train_batch_size
        self.verbose(f"Training set total {n_batches} batches.")
        if n_batches == 0:
            # a silently-untrained LM poisons every downstream fusion
            # measurement (an untrained LM at lambda>0 injects noise into
            # beam rescoring) — say so unmissably rather than "finishing"
            # 0-step epochs. Corpus has len(ds) full chunks; the caller
            # should shrink train_batch_size or grow the corpus.
            self.verbose(
                "WARNING: 0 train batches — the corpus yields "
                f"{len(self.ds)} chunks of {self.ds.chunk_size} chars but "
                f"train_batch_size={self.train_batch_size}; the LM will be "
                "saved UNTRAINED. Shrink the batch or grow the corpus.")
        for epoch in range(self.n_epochs):
            self.verbose(f"Starting epoch {epoch + 1} out of {self.n_epochs}")
            # multi-host: rotate the chunk shard so truncated tail chunks
            # aren't stranded on the same host forever (ASR-path contract)
            self.ds.set_epoch(epoch)
            for b_ind, (x, y) in enumerate(
                self.ds.iter_batches(self.train_batch_size, shuffle=True, seed=epoch)
            ):
                self.verbose(
                    f"Batch: {b_ind}/{n_batches}, global step: {self.tr.step}",
                    progress=True,
                )
                self.params, self.opt_state, loss, _ = self._train_step(
                    self.params,
                    self.opt_state,
                    self.place_batch({"y": y})["y"],
                    self.place_replicated(self.next_key()),
                )
                loss_by_char = float(loss) / self.chunk_size

                if self.tr.step % self.logging_step == 0:
                    self.lg.scalar("train_loss", loss_by_char, self.tr.step)

                if self.tr.step % self.valid_step == 0:
                    generated = self.generate()
                    self.lg.text("text_generate", generated, self.tr.step)
                    if loss_by_char < self.tr.get_best():
                        self.tr.set_best(loss_by_char)
                        self.save_tree(self.best_ckppath, self.params)

                if self.tr.step % self.save_step == 0:
                    self.verbose(f"Model saved at step {self.tr.step}")
                    self.save_state(self.params, self.opt_state)

                self.tr.do_step()
            self.verbose(f"Epoch {epoch} finished")

    def generate(self, length: int = 100, temp: float = 0.8, start: str = SOS_TKN) -> str:
        start_ids = jnp.asarray(self.mapper.encode(start))
        out = charlm.generate(self.params, self.cfg, self.next_key(), length, temp, start_ids)
        return start + self.mapper.decode(np.asarray(out))

    def predict(self, x: str, y: str, tf_rate: float) -> float:
        """Teacher-forced probe: accuracy of next-char prediction on a fixed
        sentence at the given tf rate (reference trainer.py:280-317).

        ``x`` is accepted for reference-API parity but — exactly like the
        reference — only its length matters: step 0 is fed SOS (id 0) and
        the teacher char at step i is ``y[i]`` (== ``x[i+1]``), so the
        content of ``x`` never enters the unroll (trainer.py:293-309)."""
        y_ids = jnp.asarray(self.mapper.encode(y))[None, :]
        logits = charlm.teacher_forced_unroll(
            self.params, self.cfg, y_ids, self.next_key(), tf_rate=tf_rate
        )
        pred = np.asarray(jnp.argmax(logits, axis=-1))[0]
        pred_str = self.mapper.decode(pred)
        c = sum(int(pred_str[i] == y[i]) for i in range(len(pred_str)))
        acc = 100 * c / len(pred_str)
        self.verbose(f"{pred_str} {acc}")
        return acc

    def close(self):
        self.verbose(f"Finished training! Saving most recent model at step {self.tr.step}")
        self.save_state(self.params, self.opt_state)
        self.lg.close()
