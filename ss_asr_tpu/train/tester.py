"""Inference: decode a test set with char-LM shallow fusion.

Reference ASRTester (src/trainer.py:547-592) decodes greedily one utterance
at a time despite its beam-size config knobs (the TODO at trainer.py:590).
Here decoding is batched on device, and beam search is available — restoring
what the reference's dead ``decode_beam_size`` knob intended.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from ss_asr_tpu.data.asr_dataset import ASRDataset
from ss_asr_tpu.decode.greedy import greedy_decode
from ss_asr_tpu.models import charlm, las
from ss_asr_tpu.train.solver import Solver
from ss_asr_tpu.utils import checkpoint as ckpt
from ss_asr_tpu.utils.metrics import char_acc_row, err_rate, with_terminal_eos


def _mean_err(hyps: List[str], refs: List[str], unit: str) -> float:
    """Mean per-utterance edit-distance error; ``unit="word"`` is the thesis'
    WER (src/postprocess.py:31-50, may exceed 1), ``unit="char"`` is CER."""
    if not hyps:
        return 0.0
    return float(np.mean([err_rate(h, r, unit) for h, r in zip(hyps, refs)]))


class ASRTester(Solver):
    def __init__(self, config, paras):
        super().__init__(config, paras, "asr")
        c = config["asr"]
        # the filename must state the policy actually applied: no ratio key
        # -> no step cap -> no "len" tag (the reference's filename hardcodes
        # the ratio whether or not it is used, src/trainer.py:553-555)
        parts = ["decode", "beam", str(c.get("decode_beam_size", 1))]
        if c.get("max_decode_step_ratio"):
            parts += ["len", str(c["max_decode_step_ratio"])]
        self.decode_file = "_".join(parts)

    def load_data(self):
        c = self.config["asr"]
        self.test_ds = ASRDataset(c["test_index"], batch_size=max(self.test_batch_size, 1), t_bucket=c.get("t_bucket", 128), l_bucket=c.get("l_bucket", 16))
        self.mapper = self.test_ds.mapper

    def set_model(self):
        c = self.config["asr"]
        self.cfg = las.ASRConfig.from_dict(c["mdl"])
        self.params = self.setup_params(lambda k: las.init_asr(k, self.cfg), self.ckppath)

        # defect #5 fix: the reference reads char_lm.hidden_size at the wrong
        # nesting level; accept both layouts
        lm_c = self.config.get("char_lm", {})
        lm_mdl = lm_c.get("mdl", lm_c)
        self.lm_cfg = charlm.CharLMConfig.from_dict(lm_mdl)
        # honor the configured checkpoint backend (char_lm.orbax vs .npz),
        # but fall back to the other backend's file if the configured one is
        # missing — the LM may have been trained under a different
        # ``checkpoint_backend`` than this test run (silently decoding
        # without fusion would skew the measured numbers)
        alt_ext = ".npz" if self.ckpt_ext != ".npz" else ckpt.ORBAX_SUFFIX
        lm_path = os.path.join(self.ckpdir, "char_lm" + self.ckpt_ext)
        if not ckpt.exists_auto(lm_path):
            alt_path = os.path.join(self.ckpdir, "char_lm" + alt_ext)
            if ckpt.exists_auto(alt_path):
                self.verbose(f"char LM not at {lm_path}; using {alt_path}")
                lm_path = alt_path
        if ckpt.exists_auto(lm_path):
            import jax

            self.lm_params = jax.tree.map(jnp.asarray, ckpt.load_auto(lm_path))
        else:
            self.verbose(f"No char LM at {lm_path}; decoding without fusion")
            self.lm_params = None

        self.lm_weight = c.get("decode_lm_weight", 0.0)
        self.decode_beam_size = c.get("decode_beam_size", 1)
        self.max_decode_steps = c.get("max_decode_steps", 200)
        # decode-length policy: cap steps at ratio * input frames (the
        # reference plumbs this knob but never uses it — trainer.py:574)
        self.decode_step_ratio = c.get("max_decode_step_ratio", None)
        self.decode_file += "_lm{}".format(self.lm_weight)

    def exec(self, lm_weight=None) -> List[str]:
        if lm_weight is None:
            lm_weight = self.lm_weight
        use_lm = self.lm_params is not None and lm_weight != 0.0
        self.verbose(
            f"Start decoding (beam size {self.decode_beam_size}, "
            f"lm_weight {lm_weight if use_lm else 0})"
        )
        results: List[str] = []
        refs: List[str] = []
        accs: List[float] = []
        for b in self.test_ds.iter_batches(drop_last=False, shuffle=False):
            toks, lens = self._decode_batch(b, lm_weight if use_lm else 0.0)
            toks, lens = np.asarray(toks), np.asarray(lens)
            valid = b.valid if b.valid is not None else np.ones(toks.shape[0], bool)
            for i in range(toks.shape[0]):
                if not valid[i]:
                    continue
                results.append(self.mapper.translate(toks[i]))
                refs.append(self.mapper.translate(b.y[i]))
                accs.append(char_acc_row(
                    with_terminal_eos(toks[i], lens[i]), b.y[i][1:]
                ))

        # aggregate test-set metrics — the numbers thesis Table 6.12 is made
        # of (the reference dumps hyp/ref pairs and computes nothing,
        # src/trainer.py:587-592): accuracy + the thesis' word-level error
        # (src/postprocess.py:31-50 semantics, can exceed 1.0) + CER.
        self.metrics: Dict[str, float] = {
            "n": len(results),
            "acc": float(np.mean(accs)) if accs else 0.0,
            "wer": _mean_err(results, refs, "word"),
            "cer": _mean_err(results, refs, "char"),
        }

        out_path = os.path.join(self.ckpdir, self.decode_file + ".txt")
        with open(out_path, "w", encoding="utf-8") as f:
            for hyp, ref in zip(results, refs):
                f.write(f"{hyp}\t{ref}\n")
        with open(os.path.join(self.ckpdir, self.decode_file + "_metrics.json"),
                  "w", encoding="utf-8") as f:
            json.dump(self.metrics, f, indent=1)
        for k in ("acc", "wer", "cer"):
            self.lg.scalar(f"test_{k}", self.metrics[k], self.tr.step)
        self.verbose(
            f"Decoded {len(results)} utterances -> {out_path} | "
            f"acc {self.metrics['acc']:.4f} wer {self.metrics['wer']:.4f} "
            f"cer {self.metrics['cer']:.4f}"
        )
        return results

    def _max_steps_for(self, b) -> int:
        ms = self.max_decode_steps
        if self.decode_step_ratio:
            from ss_asr_tpu.data.asr_dataset import round_up

            # bucketed so few jit shapes; at least one decode step
            ms = min(ms, max(8, round_up(int(self.decode_step_ratio * b.x.shape[1]), 8)))
        return ms

    def _decode_batch(self, b, lm_weight):
        max_steps = self._max_steps_for(b)
        if self.decode_beam_size > 1:
            from ss_asr_tpu.decode.beam import beam_decode

            return beam_decode(
                self.params,
                self.cfg,
                jnp.asarray(b.x),
                jnp.asarray(b.x_lens),
                beam_size=self.decode_beam_size,
                max_steps=max_steps,
                lm_params=self.lm_params if lm_weight else None,
                lm_cfg=self.lm_cfg,
                lm_weight=lm_weight,
            )
        return greedy_decode(
            self.params,
            self.cfg,
            jnp.asarray(b.x),
            jnp.asarray(b.x_lens),
            max_steps=max_steps,
            lm_params=self.lm_params if lm_weight else None,
            lm_cfg=self.lm_cfg,
            lm_weight=lm_weight,
        )
