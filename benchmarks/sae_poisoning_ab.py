"""Controlled SAE-poisoning A/B: the experiment behind docs/GAIN_AB.json.

Question: does initializing supervised ASR fine-tuning from the seed
chain's post-SAE checkpoint help or hurt, and why?  Arms (x N seeds,
everything else identical — same labeled subset, Adadelta 1.0, epochs,
batch):

  scratch         random init
  postTAE         asr_1 from a prior m5 run (TAE stage output)
  postSAE         asr_2 from the same run (SAE stage output, reference-
                  parity listener co-update)
  postSAEdamped   asr_2' from re-running the SAE stage with
                  sae.listener_lr_scale (default 0.1)

Each arm also records a listener-saturation probe (fraction of valid
encoder activations with |h| > 0.99 on a fixed batch) at init and after
fine-tuning — the mechanism marker: the reference-parity SAE co-update
tanh-saturates the shared listener (fbank targets span ~[-14,+4] vs LSTM
outputs in [-1,1]), killing gradients through it.

Usage:
  # 1. produce a gain corpus + m5 seed chain (writes asr_1/asr_2):
  python benchmarks/malromur_parity.py compare --work WORK --synthetic 640 \
      --labeled-utts 128 --epochs 250 --seed-epochs 6 --models m1,m2,m5
  # 2. the A/B over its checkpoints:
  python benchmarks/sae_poisoning_ab.py --work WORK --out AB.json

Recorded result (docs/GAIN_AB.json, TPU v5e): postSAE fails in every seed
(greedy WER 1.0-1.37) vs scratch 0.10 / postTAE 0.08; damping at 0.1 makes
TAE->SAE the BEST arm (0.070) — the thesis' M5-best ordering (Table 6.12)
reproduces once the guardrail is on.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def infer_mdl(asr_ckpt: str) -> dict:
    """Model config from a recorded checkpoint's shapes — the A/B follows
    whatever size the compare/run produced (flagship or tiny smoke)."""
    from ss_asr_tpu.utils.checkpoint import load_pytree

    p = load_pytree(asr_ckpt)
    return {
        "encoder_state_size": int(p["encoder"]["pblstm1"]["fwd"]["w_hh"].shape[0]),
        "mlp_out_size": int(p["attention"]["phi"]["w"].shape[1]),
        "decoder_state_size": int(p["decoder"]["layer1"]["w_hh"].shape[0]),
        "feature_dim": int(p["encoder"]["pblstm1"]["fwd"]["w_ih"].shape[0]),
    }


def make_saturation_probe(train_index: str, n: int = 32):
    """Fixed-batch listener-saturation probe over a training index."""
    import jax.numpy as jnp
    import pandas as pd

    from ss_asr_tpu.models.las import listener_apply

    idx = pd.read_csv(train_index, sep="\t", header=None)
    feats = [np.load(p) for p in idx.iloc[:n][1]]
    T = max(f.shape[0] for f in feats)
    x = np.zeros((len(feats), T, feats[0].shape[1]), np.float32)
    lens = np.array([f.shape[0] for f in feats], np.int32)
    for i, f in enumerate(feats):
        x[i, : f.shape[0]] = f

    def probe(asr_params: dict) -> dict:
        h, hl = listener_apply(asr_params["encoder"], jnp.asarray(x), jnp.asarray(lens))
        h = np.asarray(h)
        m = np.arange(h.shape[1])[None, :] < np.asarray(hl)[:, None]
        hv = h[m]
        return {
            "std": round(float(hv.std()), 4),
            "max_abs": round(float(np.abs(hv).max()), 4),
            "frac_gt_099": round(float((np.abs(hv) > 0.99).mean()), 4),
        }

    return probe


def rerun_sae_damped(work: str, out_dir: str, scale: float,
                     epochs: int, mdl: dict, batch: int) -> str:
    """Re-run the SAE stage from the recorded asr_1 with a damped listener
    co-update; returns the resulting ASR checkpoint path. The SAE config is
    built by malromur_parity.make_config itself, so the ONLY difference
    from the reference-parity asr_2 is listener_lr_scale."""
    from benchmarks.malromur_parity import make_config
    from ss_asr_tpu.train import SAETrainer, make_paras

    stage_dir = os.path.join(out_dir, "sae")
    if os.path.exists(stage_dir):  # stale state would resume, not re-run
        shutil.rmtree(stage_dir)
    ck = os.path.join(stage_dir, "ck", "sae_damped")
    os.makedirs(ck, exist_ok=True)
    asr_in = os.path.join(ck, "asr_in.npz")
    shutil.copyfile(os.path.join(work, "result", "m5", "asr_1.npz"), asr_in)
    proc = os.path.join(work, "processed")
    paths = {"train_index": os.path.join(proc, "train.tsv"),
             "eval_index": os.path.join(proc, "eval.tsv"),
             "unlabeled_index": os.path.join(proc, "train.tsv"),
             "lm_corpus": os.path.join(proc, "train.tsv")}  # unused here
    cfg = make_config(paths, mdl, epochs=1, batch=batch, lm_epochs=1,
                      lm_chunk=200, lm_batch=128, seed_epochs=epochs,
                      stages=("tae", "sae"), sae_listener_lr_scale=scale)
    cfg = {"asr": {"mdl": mdl}, "sae": cfg["sae"]}
    cfg["sae"]["listener_lr_scale"] = scale  # explicit even at scale 1.0
    paras = make_paras(name="sae_damped",
                       logdir=os.path.join(stage_dir, "log"),
                       ckpdir=os.path.join(stage_dir, "ck"), seed=0)
    t = SAETrainer(cfg, paras)
    t.load_data()
    asr_out = os.path.join(ck, "asr_2_damped.npz")
    t.set_model(asrpath=(asr_in, asr_out))
    t.exec()
    t.close()
    return asr_out


def finetune_arm(work: str, out_dir: str, name: str, init_path, seed: int,
                 epochs: int, labeled_index: str, mdl: dict,
                 max_decode_steps: int, batch: int) -> dict:
    from benchmarks.quality_protocol import eval_decode_modes
    from ss_asr_tpu.train import ASRTrainer, make_paras

    arm = os.path.join(out_dir, f"{name}_s{seed}")
    if os.path.exists(arm):
        # a stale arm dir would RESUME (trained ckpt + optimizer state +
        # tracker step), silently corrupting the controlled experiment
        shutil.rmtree(arm)
    ck = os.path.join(arm, "ck", f"{name}_s{seed}")
    os.makedirs(ck, exist_ok=True)
    if init_path is not None:
        shutil.copyfile(init_path, os.path.join(ck, "asr.npz"))
    lm_src = os.path.join(work, "result", "m5", "char_lm.npz")
    shutil.copyfile(lm_src, os.path.join(ck, "char_lm.npz"))
    lm = np.load(lm_src)
    lm_mdl = {"embedding_size": int(lm["emb/table"].shape[1]),
              "hidden_size": int(lm["gru1/w_hh"].shape[0])}
    eval_index = os.path.join(work, "processed", "eval.tsv")
    config = {
        "asr": {
            "train_index": labeled_index, "valid_index": eval_index,
            "test_index": eval_index, "mdl": {**mdl, "tf_rate": 0.9},
            "opt": {"type": "adadelta", "learning_rate": 1.0},
            "train_batch_size": batch, "valid_batch_size": batch,
            "n_epochs": epochs,
            "logging_step": 250, "valid_step": 2000, "save_step": 10**9,
        },
        "char_lm": {"mdl": lm_mdl, "opt": {}},
    }
    paras = make_paras(name=f"{name}_s{seed}", logdir=os.path.join(arm, "log"),
                       ckpdir=os.path.join(arm, "ck"), seed=seed)
    t = ASRTrainer(config, paras)
    t.load_data(); t.set_model(); t.exec(); t.close()
    r = eval_decode_modes(config, paras, 0.2, max_steps=max_decode_steps)
    # keep every decode mode's metrics — the beam passes already ran
    metrics = {k: v for k, v in r.items()
               if k.endswith(("_wer", "_acc", "_cer"))}
    return {"metrics": metrics,
            "final_ckpt": os.path.join(ck, "asr.npz")}


def run_ab(work: str, out_dir: str, seeds=(0, 1, 2), epochs: int = 250,
           damped_scale: float = 0.1, sae_epochs: int = 6,
           labeled_index: str | None = None,
           max_decode_steps: int = 60, batch: int = 32) -> dict:
    os.makedirs(out_dir, exist_ok=True)
    labeled_index = labeled_index or _find_labeled_index(work)
    probe = make_saturation_probe(labeled_index)

    from ss_asr_tpu.utils.checkpoint import load_pytree

    asr1 = os.path.join(work, "result", "m5", "asr_1.npz")
    asr2 = os.path.join(work, "result", "m5", "asr_2.npz")
    mdl = infer_mdl(asr1)
    asr2d = rerun_sae_damped(work, out_dir, damped_scale, sae_epochs, mdl,
                             batch)

    results = {"init_saturation": {
        "postTAE": probe(load_pytree(asr1)),
        "postSAE": probe(load_pytree(asr2)),
        "postSAEdamped": probe(load_pytree(asr2d)),
    }}
    for name, init in (("scratch", None), ("postTAE", asr1),
                       ("postSAE", asr2), ("postSAEdamped", asr2d)):
        for seed in seeds:
            r = finetune_arm(work, out_dir, name, init, seed, epochs,
                             labeled_index, mdl, max_decode_steps, batch)
            r["final_saturation"] = probe(load_pytree(r["final_ckpt"]))
            del r["final_ckpt"]
            results[f"{name}_s{seed}"] = r
            print(f"{name}_s{seed}", json.dumps(r), flush=True)
    return results


def _find_labeled_index(work: str) -> str:
    proc = os.path.join(work, "processed")
    subs = [f for f in os.listdir(proc)
            if f.startswith("train_") and f.endswith(".tsv")]
    if subs:
        return os.path.join(proc, sorted(subs)[0])
    return os.path.join(proc, "train.tsv")


ARM_LABELS = {  # raw run_ab arm prefixes -> recorded-artifact arm names
    "scratch": "scratch",
    "postTAE": "post_TAE",
    "postSAE": "post_SAE_parity",
    "postSAEdamped": "post_SAE_damped",
}


def shape_for_record(results: dict, damped_scale: float = 0.1,
                     what: str | None = None,
                     regime: dict | None = None,
                     labels: dict | None = None) -> dict:
    """Raw run_ab() output -> the docs/GAIN_AB*.json layout
    (``arms.<name>.per_seed`` + per-arm mean/range), poolable by
    benchmarks/gain_stats.summarize_ab.

    ``labels`` overrides the default raw-prefix -> arm-name mapping — e.g.
    when the producing compare run was ITSELF damped, its asr_2 is not a
    parity checkpoint and the 'postSAE' arm must not be recorded as one.
    """
    label_map = dict(ARM_LABELS, **(labels or {}))

    def label_for(prefix: str) -> str:
        label = label_map.get(prefix, prefix)
        if label == "post_SAE_damped":
            label = f"post_SAE_damped_{damped_scale}"
        return label

    arms: dict = {}
    for key, rec in results.items():
        if "_s" not in key or "metrics" not in rec:
            continue
        prefix, seed = key.rsplit("_s", 1)
        label = label_for(prefix)
        entry = dict(rec["metrics"])
        if "final_saturation" in rec:
            entry["final_saturation"] = rec["final_saturation"]
        arms.setdefault(label, {"per_seed": {}})["per_seed"][key] = entry
    for rec in arms.values():
        wers = [v["greedy_wer"] for v in rec["per_seed"].values()]
        rec["greedy_wer_mean"] = round(sum(wers) / len(wers), 4)
        rec["greedy_wer_range"] = [min(wers), max(wers)]
    out = {}
    if what:
        out["what"] = what
    if regime:
        out["regime"] = regime
    if "init_saturation" in results:
        out["init_saturation"] = {
            label_for(k): v for k, v in results["init_saturation"].items()}
    out["arms"] = arms
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", required=True,
                    help="a malromur_parity compare/run work dir that already "
                         "holds result/m5/{asr_1,asr_2,char_lm}.npz. NB the "
                         "'postSAE' arm inherits whatever "
                         "--sae-listener-lr-scale the producing run used — "
                         "it is only a reference-PARITY arm if that run used "
                         "1.0 (verify via the recorded init_saturation probe: "
                         "parity saturates, std~0.7; damped does not)")
    ap.add_argument("--out-dir", default=None)
    ap.add_argument("--seeds", default="0,1,2")
    ap.add_argument("--epochs", type=int, default=250)
    ap.add_argument("--sae-epochs", type=int, default=6)
    ap.add_argument("--damped-scale", type=float, default=0.1)
    ap.add_argument("--max-decode-steps", type=int, default=60)
    ap.add_argument("--batch", type=int, default=32,
                    help="match the producing compare run's --batch")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    out_dir = args.out_dir or os.path.join(args.work, "sae_ab")
    seeds = tuple(int(s) for s in args.seeds.split(","))
    results = run_ab(args.work, out_dir, seeds=seeds, epochs=args.epochs,
                     damped_scale=args.damped_scale, sae_epochs=args.sae_epochs,
                     max_decode_steps=args.max_decode_steps, batch=args.batch)
    line = json.dumps(results, indent=1)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
