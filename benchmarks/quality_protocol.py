"""Re-runnable quality protocol: synthetic corpus -> train -> CER table.

Scripts the thesis' decode-quality methodology (Table 6.12: direct vs beam-8
vs beam-8 + LM fusion; BASELINE.md "CER on Málrómur eval") against the
synthetic tone corpus, so quality claims are a checked-in artifact instead of
prose. No real corpus ships in this environment; the tone corpus is exactly
learnable, and the --epochs knob moves the operating point between the
high-error regime (where beam/LM fusion matters, few epochs) and convergence.

Usage:
    python benchmarks/quality_protocol.py --work /tmp/qp --size small \
        --n-utts 96 --epochs 12 --out docs/QUALITY_PROTOCOL.json

Emits one JSON object: eval CER for greedy, beam-8, beam-8+LM (and the raw
per-mode error counts), plus the config that produced them.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SIZES = {
    "tiny": {"encoder_state_size": 8, "mlp_out_size": 8, "decoder_state_size": 8},
    "small": {"encoder_state_size": 32, "mlp_out_size": 16, "decoder_state_size": 32},
    "flagship": {"encoder_state_size": 256, "mlp_out_size": 128, "decoder_state_size": 256},
}


#: held out of ASR *audio* training in --heldout mode; the char LM still
#: sees their spellings. With --homophones their i/g chars are acoustically
#: e/c, so greedy has neither acoustics nor lexical memory to spell them —
#: exactly the thesis' low-resource-ASR + big-text-LM condition (Table 6.12)
HELD_OUT_WORDS = ("fig", "dig", "hide")

#: --mixed regime: a LARGER hold-out from WORDS_LARGE, with the eval set
#: drawn from the FULL vocabulary (trained + held-out words mixed). Trained
#: words decode well, held-out i/g-heavy words need the LM — a mid-error
#: operating point where the lm-weight sweep has real gradient signal
#: (round-2 held-out artifact collapsed to identical results across weights)
HELD_OUT_MIXED = ("fig", "dig", "hide", "gibe", "jig", "iced", "fib",
                  "gad", "cage", "badge")


def _lm_text(words, reps: int, seed: int) -> str:
    import numpy as np

    rng = np.random.default_rng(seed + 77)
    toks = [str(rng.choice(list(words))) for _ in range(reps)]
    return " ".join(toks)


def build_corpus(work: str, n_utts: int, seed: int,
                 homophones: bool = False, heldout: bool = False,
                 mixed: bool = False) -> dict:
    """Synthesize, preprocess, split; returns index/corpus paths."""
    from ss_asr_tpu.cli.mkdata import WORDS, WORDS_LARGE, make_corpus
    from ss_asr_tpu.cli.preprocess import preprocess_generic
    from ss_asr_tpu.data.index import make_split

    corpus = os.path.join(work, "corpus")
    processed = os.path.join(work, "processed")
    lm_corpus = os.path.join(work, "lm.txt")

    if mixed:
        # mid-error large-vocabulary regime: 40-word inventory, 10 words
        # held out of audio training, eval mixes trained + held-out words
        train_words = [w for w in WORDS_LARGE if w not in HELD_OUT_MIXED]
        eval_corpus = os.path.join(work, "corpus_eval")
        eval_processed = os.path.join(work, "processed_eval")
        make_corpus(corpus, n=n_utts, seed=seed, homophones=homophones,
                    words=train_words)
        make_corpus(eval_corpus, n=max(n_utts // 3, 32), seed=seed + 1,
                    homophones=homophones, words=WORDS_LARGE, max_words=2)
        preprocess_generic(os.path.join(corpus, "txt"),
                           os.path.join(corpus, "wav"),
                           processed_dir=processed, sr=8000)
        preprocess_generic(os.path.join(eval_corpus, "txt"),
                           os.path.join(eval_corpus, "wav"),
                           processed_dir=eval_processed, sr=8000)
        with open(lm_corpus, "w", encoding="utf-8") as fh:
            fh.write(_lm_text(list(WORDS_LARGE) + 2 * list(HELD_OUT_MIXED),
                              reps=4000, seed=seed))
        return {
            "train_index": os.path.join(processed, "index.tsv"),
            "eval_index": os.path.join(eval_processed, "index.tsv"),
            "lm_corpus": lm_corpus,
        }

    if heldout:
        train_words = [w for w in WORDS if w not in HELD_OUT_WORDS]
        eval_corpus = os.path.join(work, "corpus_eval")
        eval_processed = os.path.join(work, "processed_eval")
        make_corpus(corpus, n=n_utts, seed=seed, homophones=homophones,
                    words=train_words)
        make_corpus(eval_corpus, n=max(n_utts // 4, 24), seed=seed + 1,
                    homophones=homophones, words=HELD_OUT_WORDS, max_words=2)
        preprocess_generic(os.path.join(corpus, "txt"),
                           os.path.join(corpus, "wav"),
                           processed_dir=processed, sr=8000)
        preprocess_generic(os.path.join(eval_corpus, "txt"),
                           os.path.join(eval_corpus, "wav"),
                           processed_dir=eval_processed, sr=8000)
        # LM sees ALL spellings, weighted toward the held-out words
        with open(lm_corpus, "w", encoding="utf-8") as fh:
            fh.write(_lm_text(list(WORDS) + 3 * list(HELD_OUT_WORDS),
                              reps=2000, seed=seed))
        return {
            "train_index": os.path.join(processed, "index.tsv"),
            "eval_index": os.path.join(eval_processed, "index.tsv"),
            "lm_corpus": lm_corpus,
        }

    make_corpus(corpus, n=n_utts, seed=seed, homophones=homophones)
    preprocess_generic(os.path.join(corpus, "txt"), os.path.join(corpus, "wav"),
                       processed_dir=processed, sr=8000)
    make_split(os.path.join(processed, "index.tsv"), seed=seed)

    # char-LM corpus: the TRAIN-split transcripts only — the eval split must
    # stay unseen by the LM, or the beam+LM comparison scores memorized text
    texts = []
    with open(os.path.join(processed, "train.tsv"), encoding="utf-8") as fh:
        for line in fh:
            t = line.split("\t")[0].strip()
            texts.append(t.lstrip("<").rstrip(">"))
    with open(lm_corpus, "w", encoding="utf-8") as fh:
        fh.write(" ".join(texts * 4))
    return {
        "train_index": os.path.join(processed, "train.tsv"),
        "eval_index": os.path.join(processed, "eval.tsv"),
        "lm_corpus": lm_corpus,
    }


def make_config(paths: dict, size: str, epochs: int, batch: int,
                opt: str = "Adadelta", lr: float = 1.0,
                augment: dict | None = None) -> dict:
    mdl = {**SIZES[size], "tf_rate": 0.9, "feature_dim": 40}
    return {
        "asr": {
            **({"augment": augment} if augment else {}),
            # reference default: Adadelta lr=1.0 (conf/default.yaml asr.opt)
            "opt": {"type": opt, "learning_rate": lr},
            "mdl": mdl,
            "train_index": paths["train_index"],
            "valid_index": paths["eval_index"],
            "test_index": paths["eval_index"],
            # coarse buckets: fewer padded shapes -> fewer (remote) compiles
            "t_bucket": 128, "l_bucket": 16,
            "train_batch_size": batch, "valid_batch_size": batch,
            "n_epochs": epochs, "valid_step": 10**9, "logging_step": 50,
            "save_step": 10**9, "wer_step": 10**9,
        },
        "char_lm": {
            "opt": {"type": "Adam", "learning_rate": 0.002},
            "mdl": {"hidden_size": 64, "tf_rate": 0.9},
            "train_index": paths["lm_corpus"],
            "chunk_size": 50, "train_batch_size": 8,
            "n_epochs": max(epochs, 8), "valid_step": 10**9,
            "logging_step": 50, "save_step": 10**9,
        },
    }


def eval_decode_modes(config, paras, lm_weight: float, beam: int = 8,
                      max_steps: int = 60, lm_sweep=None,
                      rescore: bool = False,
                      decode_modes=("greedy", "beam", "beam_lm"),
                      avg_params=None) -> dict:
    """Decode the eval set three ways; reports CER + the thesis' actual
    metrics (word error and char accuracy, src/postprocess.py:7-50 / Tables
    6.6-6.12) per decode mode.

    ``lm_sweep``: optional extra fusion weights — each adds one beam+LM
    decode over the SAME trained model (one compile per weight), reported
    in an ``lm_weight_sweep`` table; ``lm_weight`` stays the headline.

    ``rescore``: also run the two-pass alternative — ONE fusion-free
    n-best decode, then ``decode.rescore`` re-ranks under every sweep
    weight (one LM pass total).  Reported as ``rescore@w`` modes + a
    ``rescore_sweep`` table, so one-pass (search-steered) and two-pass
    (n-best-restricted) fusion are directly comparable on the same model.

    ``decode_modes``: subset of {"greedy", "beam", "beam_lm"} — quick
    experiments can skip the expensive beam passes (e.g. ("greedy",))."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ss_asr_tpu.data.asr_dataset import ASRDataset
    from ss_asr_tpu.decode.beam import beam_decode, beam_decode_nbest
    from ss_asr_tpu.decode.greedy import greedy_decode
    from ss_asr_tpu.decode.rescore import rescore_nbest
    from ss_asr_tpu.models import charlm, las
    from ss_asr_tpu.utils import checkpoint as ckpt
    from ss_asr_tpu.utils.editdistance import edit_distance
    from ss_asr_tpu.utils.metrics import char_acc_row, err_rate, with_terminal_eos

    c = config["asr"]
    ckpdir = os.path.join(paras.ckpdir, paras.name)
    cfg = las.ASRConfig.from_dict(c["mdl"])
    params = jax.tree.map(jnp.asarray, ckpt.load_pytree(os.path.join(ckpdir, "asr.npz")))
    lm_cfg = lm_params = None
    if rescore or "beam_lm" in decode_modes:  # greedy/beam-only needs no LM
        lm_cfg = charlm.CharLMConfig.from_dict(config["char_lm"]["mdl"])
        lm_params = jax.tree.map(
            jnp.asarray, ckpt.load_pytree(os.path.join(ckpdir, "char_lm.npz"))
        )

    # one big bucket -> one padded shape -> exactly one XLA compile per
    # decode mode (remote compiles are the dominant cost of this protocol)
    ds = ASRDataset(c["test_index"], batch_size=c["valid_batch_size"],
                    t_bucket=512, l_bucket=64)
    mapper = ds.mapper

    weights = [lm_weight] + [w for w in (lm_sweep or []) if w != lm_weight]
    modes = {}
    if "greedy" in decode_modes:
        modes["greedy"] = lambda x, xl: greedy_decode(params, cfg, x, xl, max_steps)
    if "beam" in decode_modes:
        modes[f"beam{beam}"] = lambda x, xl: beam_decode(
            params, cfg, x, xl, beam_size=beam, max_steps=max_steps
        )
    if "beam_lm" in decode_modes:
        for w in weights:
            name = f"beam{beam}_lm" if w == lm_weight else f"beam{beam}_lm@{w:g}"
            modes[name] = (
                lambda w: lambda x, xl: beam_decode(
                    params, cfg, x, xl, beam_size=beam, max_steps=max_steps,
                    lm_params=lm_params, lm_cfg=lm_cfg, lm_weight=w,
                )
            )(w)
    if avg_params is not None:
        # the same decode passes from the checkpoint-averaged weights
        # (keep_snapshots + average_pytrees), reported side-by-side as
        # <mode>_avg so the smoothing gain is read off one table
        avg_p = jax.tree.map(jnp.asarray, avg_params)
        if "greedy" in decode_modes:
            modes["greedy_avg"] = lambda x, xl: greedy_decode(
                avg_p, cfg, x, xl, max_steps)
        if "beam" in decode_modes:
            modes[f"beam{beam}_avg"] = lambda x, xl: beam_decode(
                avg_p, cfg, x, xl, beam_size=beam, max_steps=max_steps)
    rescore_modes = [f"rescore@{w:g}" for w in sorted(weights)] if rescore else []
    all_modes = list(modes) + rescore_modes
    errs = {m: 0 for m in all_modes}
    wers = {m: 0.0 for m in all_modes}  # sum of per-utt word errors (thesis WER)
    accs = {m: 0.0 for m in all_modes}  # sum of per-utt char accuracies
    chars = 0
    n_utts = 0
    hyp_samples = {m: [] for m in all_modes}

    def accumulate(m, toks, lens, valid, labels, y):
        for i in np.nonzero(valid)[0]:
            hyp = mapper.translate(toks[i])
            errs[m] += edit_distance(list(hyp), list(labels[i]))
            wers[m] += err_rate(hyp, labels[i], "word")
            accs[m] += char_acc_row(
                with_terminal_eos(toks[i], lens[i]), y[i][1:]
            )
            if len(hyp_samples[m]) < 3:
                hyp_samples[m].append({"hyp": hyp, "ref": labels[i]})

    for b in ds.iter_batches(drop_last=False, prefetch=0):
        valid = b.valid if b.valid is not None else np.ones(b.y.shape[0], bool)
        x, xl = jnp.asarray(b.x), jnp.asarray(b.x_lens)
        labels = [mapper.translate(r) for r in b.y[:, 1:]]
        for m, fn in modes.items():
            toks, lens = fn(x, xl)
            toks, lens = np.asarray(toks), np.asarray(lens).reshape(-1)
            accumulate(m, toks, lens, valid, labels, b.y)
        if rescore:
            toksN, lensN, scoresN = beam_decode_nbest(
                params, cfg, x, xl, beam_size=beam, max_steps=max_steps
            )
            ranked = rescore_nbest(toksN, lensN, scoresN, lm_params, lm_cfg,
                                   sorted(weights))
            rows = np.arange(toksN.shape[0])
            for w, (best, _) in ranked.items():
                accumulate(f"rescore@{w:g}", toksN[rows, best],
                           lensN[rows, best], valid, labels, b.y)
        chars += sum(max(len(labels[i]), 1) for i in np.nonzero(valid)[0])
        n_utts += int(valid.sum())
    nu = max(n_utts, 1)
    out = {f"{m}_cer": round(errs[m] / max(chars, 1), 4) for m in all_modes}
    # the thesis' actual table metrics (acc/err pairs, postprocess.py:7-50)
    out.update({f"{m}_wer": round(wers[m] / nu, 4) for m in all_modes})
    out.update({f"{m}_acc": round(accs[m] / nu, 4) for m in all_modes})
    out.update({f"{m}_char_errors": int(errs[m]) for m in all_modes})
    out["n_eval_utts"] = n_utts
    out["n_label_chars"] = chars
    if rescore:
        out["rescore_sweep"] = [
            {"lm_weight": w,
             **{f"rescore_{met}": out[f"rescore@{w:g}_{met}"]
                for met in ("cer", "wer", "acc")}}
            for w in sorted(weights)
        ]
    if len(weights) > 1 and {"greedy", "beam", "beam_lm"} <= set(decode_modes):
        out["lm_weight_sweep"] = [
            {
                "lm_weight": w,
                **{
                    f"{tag}_{met}": out[f"{tag}_{met}"]
                    for tag in ("greedy", f"beam{beam}")
                    for met in ("cer", "wer", "acc")
                },
                **{
                    f"beam{beam}_lm_{met}": out[
                        f"beam{beam}_lm_{met}" if w == lm_weight
                        else f"beam{beam}_lm@{w:g}_{met}"
                    ]
                    for met in ("cer", "wer", "acc")
                },
            }
            for w in sorted(weights)
        ]
    out["samples"] = hyp_samples
    return out


def run(work: str, size: str, n_utts: int, epochs: int, seed: int,
        lm_weight: float, batch: int = 8, homophones: bool = False,
        opt: str = "Adadelta", lr: float = 1.0, heldout: bool = False,
        mixed: bool = False, lm_sweep=None, augment: dict | None = None,
        rescore: bool = False,
        decode_modes=("greedy", "beam", "beam_lm"),
        avg_snapshots: int = 0) -> dict:
    from ss_asr_tpu.train import ASRTrainer, CHARLMTrainer, make_paras
    from ss_asr_tpu.utils import checkpoint as ckpt

    os.makedirs(work, exist_ok=True)
    paths = build_corpus(work, n_utts, seed, homophones=homophones,
                         heldout=heldout, mixed=mixed)
    config = make_config(paths, size, epochs, batch, opt=opt, lr=lr,
                         augment=augment)
    paras = make_paras(name="qp", logdir=os.path.join(work, "runs"),
                       ckpdir=os.path.join(work, "result"), seed=seed, verbose=False)

    t = ASRTrainer(config, paras)
    t.load_data()
    if avg_snapshots > 0:
        # spread K cadence snapshots over the run; close() adds the final
        # step, so the averaged window ends at the last checkpoint
        total = t.train_ds.num_batches() * epochs
        t.save_step = max(1, total // (avg_snapshots + 1))
        t.keep_snapshots = avg_snapshots
    t.set_model(); t.exec(); t.close()

    if rescore or "beam_lm" in decode_modes:  # greedy/beam-only: skip LM train
        lm = CHARLMTrainer(config, paras)
        lm.load_data(); lm.set_model(); lm.exec(); lm.close()

    avg_params = None
    avg_steps = []
    if avg_snapshots > 0:
        ckpdir = os.path.join(paras.ckpdir, paras.name)
        snaps = ckpt.list_snapshots(ckpdir, "asr")[-avg_snapshots:]
        avg_steps = [s for s, _ in snaps]
        avg_params = ckpt.average_pytrees([p for _, p in snaps])

    result = eval_decode_modes(config, paras, lm_weight, lm_sweep=lm_sweep,
                               rescore=rescore, decode_modes=decode_modes,
                               avg_params=avg_params)
    if avg_snapshots > 0:
        result["avg_snapshot_steps"] = avg_steps
    import jax

    result["platform"] = jax.devices()[0].platform
    result["config"] = {"size": size, "n_utts": n_utts, "epochs": epochs,
                        "seed": seed, "lm_weight": lm_weight,
                        "homophones": homophones, "opt": opt, "lr": lr,
                        "heldout": heldout, "mixed": mixed, "augment": augment,
                        "rescore": rescore,
                        "decode_modes": list(decode_modes),
                        "avg_snapshots": avg_snapshots}
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", default="/tmp/ss_asr_quality_protocol")
    ap.add_argument("--size", choices=sorted(SIZES), default="small")
    ap.add_argument("--n-utts", type=int, default=96)
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--lm-weight", type=float, default=0.3)
    ap.add_argument("--out", default=None, help="write the JSON table here too")
    ap.add_argument("--homophones", action="store_true",
                    help="acoustically ambiguous corpus: only the LM can pick "
                         "the right spelling (high-error-regime beam/LM test)")
    ap.add_argument("--opt", default="Adadelta")
    ap.add_argument("--lr", type=float, default=1.0)
    ap.add_argument("--augment", default=None,
                    help="JSON SpecAugment config for asr.augment, e.g. "
                         "'{\"n_time_masks\": 2, \"time_mask_width\": 16, "
                         "\"n_freq_masks\": 0}'")
    ap.add_argument("--lm-sweep", default=None,
                    help="comma-separated extra fusion weights, e.g. "
                         "'0.05,0.2' — evaluated against the same trained "
                         "model and reported as lm_weight_sweep")
    ap.add_argument("--heldout", action="store_true",
                    help="hold fig/dig/hide out of ASR audio training; the "
                         "LM still sees their spellings (thesis low-resource "
                         "condition — beam+LM must beat greedy here)")
    ap.add_argument("--mixed", action="store_true",
                    help="mid-error large-vocabulary regime: 40-word "
                         "inventory, 10 words held out of audio training, "
                         "eval mixes trained + held-out words")
    ap.add_argument("--rescore", action="store_true",
                    help="also evaluate two-pass fusion: one fusion-free "
                         "n-best decode + decode.rescore at every sweep "
                         "weight (reported as rescore@w / rescore_sweep)")
    ap.add_argument("--modes", default="greedy,beam,beam_lm",
                    help="comma-separated decode modes to run (subset of "
                         "greedy,beam,beam_lm) — e.g. '--modes greedy' for a "
                         "quick pass that skips beam search AND LM training")
    ap.add_argument("--avg-snapshots", type=int, default=0,
                    help="K > 0: also decode from the mean of the last K "
                         "training snapshots (checkpoint averaging), "
                         "reported as <mode>_avg columns")
    args = ap.parse_args()

    modes = tuple(m.strip() for m in args.modes.split(",") if m.strip())
    bad = set(modes) - {"greedy", "beam", "beam_lm"}
    if bad:
        ap.error(f"unknown --modes entries: {sorted(bad)}")
    sweep = [float(w) for w in args.lm_sweep.split(",")] if args.lm_sweep else None
    augment = json.loads(args.augment) if args.augment else None
    # corpus-builder/trainer chatter goes to stderr; stdout carries only the
    # JSON table so `... | python -c 'json.load(sys.stdin)'` pipelines work
    import contextlib

    with contextlib.redirect_stdout(sys.stderr):
        result = run(args.work, args.size, args.n_utts, args.epochs, args.seed,
                     args.lm_weight, homophones=args.homophones,
                     opt=args.opt, lr=args.lr, heldout=args.heldout,
                     mixed=args.mixed, lm_sweep=sweep, augment=augment,
                     rescore=args.rescore, decode_modes=modes,
                     avg_snapshots=args.avg_snapshots)
    line = json.dumps(result, indent=1)
    print(line)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
