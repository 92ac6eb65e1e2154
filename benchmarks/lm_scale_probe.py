"""Does scaling the synthetic LM corpus close the gap to the thesis' 70.8%?

Round-4 VERDICT weak #5: the recorded char-LM probe tops out near 25%
teacher-forced accuracy vs the thesis' 70.8% (Table 6.3), with "the
synthetic LM corpus is tiny" as the untested explanation.  This harness
tests it: train the reference-config char LM (hidden 128, chunk 200,
batch 128, Adam 1e-4 — conf/default.yaml / thesis Table 6.2 protocol) on
geometrically growing synthetic corpora at a MATCHED optimization budget
(epochs chosen so total steps are ~equal), then run the tf-rate probe
(benchmarks/lm_probe.py, thesis Table 6.3 protocol) on each and record the
tf=1.0 accuracy trend.

Matched steps isolate corpus size/diversity from compute: with a fixed
epoch count a 16x corpus would also get 16x the gradient steps and the
trend would conflate the two.

    python benchmarks/lm_scale_probe.py --work .campaign/lm_scale \
        --sizes 60000,240000,960000 --target-steps 900 \
        --out docs/LM_SCALE.json

Reference anchors: char-LM trainer protocol /root/reference/src/
trainer.py:197-372, probe src/trainer.py:280-317, thesis Tables 6.2-6.3.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def train_and_probe(work: str, reps: int, target_steps: int,
                    seed: int = 0, hidden_size: int = 128) -> dict:
    from benchmarks.lm_probe import probe
    from benchmarks.quality_protocol import _lm_text
    from ss_asr_tpu.cli.mkdata import WORDS_LARGE
    from ss_asr_tpu.train import CHARLMTrainer, make_paras

    os.makedirs(work, exist_ok=True)
    lm_corpus = os.path.join(work, "lm_corpus.txt")
    text = _lm_text(WORDS_LARGE, reps=reps, seed=seed)
    with open(lm_corpus, "w", encoding="utf-8") as f:
        f.write(text)
    chunk, batch = 200, 128
    # loader drops partial batches; 90/10 split leaves ~0.9 of the chunks
    steps_per_epoch = max(int(0.9 * len(text) / chunk) // batch, 1)
    epochs = max(round(target_steps / steps_per_epoch), 1)

    config = {"char_lm": {
        "opt": {"type": "Adam", "learning_rate": 1e-4},
        "mdl": {"hidden_size": hidden_size, "tf_rate": 0.9},
        "train_index": lm_corpus, "chunk_size": chunk,
        "train_batch_size": batch, "n_epochs": epochs,
        "valid_step": 10**9, "logging_step": 250, "save_step": 10**9,
    }}
    paras = make_paras(name="lm", logdir=os.path.join(work, "runs"),
                       ckpdir=os.path.join(work, "result"))
    t = CHARLMTrainer(config, paras)
    t.load_data()
    t.set_model()
    t.exec()
    t.close()

    row = probe(work, "lm", hidden_size=hidden_size)
    tf10 = next(r for r in row["sweep"] if r["tf_rate"] == 1.0)
    return {
        "reps": reps, "n_chars": len(text),
        "steps_per_epoch": steps_per_epoch, "epochs": epochs,
        "total_steps": steps_per_epoch * epochs,
        "tf1_mean_acc_pct": tf10["mean_acc_pct"],
        "endpoint_delta_pct": row["endpoint_delta_pct"],
        "sweep": row["sweep"],
    }


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--work", required=True)
    ap.add_argument("--sizes", default="60000,240000,960000")
    ap.add_argument("--target-steps", type=int, default=900)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)

    sizes = [int(s) for s in args.sizes.split(",") if s.strip()]
    rows = []
    for reps in sizes:
        print(f"lm_scale: reps={reps} ...", file=sys.stderr, flush=True)
        rows.append(train_and_probe(
            os.path.join(args.work, f"r{reps}"), reps, args.target_steps,
            seed=args.seed))
        print(f"  tf=1.0 acc {rows[-1]['tf1_mean_acc_pct']}%",
              file=sys.stderr, flush=True)

    accs = [r["tf1_mean_acc_pct"] for r in rows]
    rising = all(a < b for a, b in zip(accs, accs[1:]))
    out = {
        "what": ("char-LM tf=1.0 probe accuracy vs synthetic-corpus size at "
                 "matched optimization steps (thesis Table 6.3 target: "
                 "70.8% on Risamalheild-trained LM)"),
        "thesis_tf1_acc_pct": 70.8,
        "target_steps": args.target_steps,
        "rows": [{k: v for k, v in r.items() if k != "sweep"} for r in rows],
        "sweeps": {str(r["reps"]): r["sweep"] for r in rows},
    }
    if rising:
        out["verdict"] = (
            f"tf=1.0 accuracy rises monotonically with corpus size "
            f"({' -> '.join(str(a) for a in accs)}%) — the recorded "
            f"LM_PROBE ceiling is a corpus-size artifact, quantified; "
            f"gap to the thesis' 70.8% remaining at the largest size: "
            f"{round(70.8 - accs[-1], 1)} pts")
    else:
        out["verdict"] = (
            f"tf=1.0 accuracy does NOT rise monotonically with corpus size "
            f"({' -> '.join(str(a) for a in accs)}%) — corpus size alone "
            f"does not explain the gap to 70.8% at this model/step budget")
    blob = json.dumps(out, indent=1, ensure_ascii=False)
    if args.out:
        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        with open(args.out, "w", encoding="utf-8") as f:
            f.write(blob)
    print(blob)


if __name__ == "__main__":
    main()
