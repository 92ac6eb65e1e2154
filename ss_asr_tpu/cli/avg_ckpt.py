"""Checkpoint-averaging CLI (beyond-reference: the upstream keeps only
latest+best checkpoints, src/trainer.py:448-451, and never averages).

Decoding from the elementwise mean of the last K step-stamped snapshots
(written by trainers configured with ``keep_snapshots: K``) smooths late-SGD
parameter noise — the standard end-to-end-ASR trick (average-last-5,
Vaswani et al. 2017 §6.1; routine in ESPnet recipes). The output is an
ordinary checkpoint: point any consumer (ASRTester, Transcriber, a resume)
at it.

    # average explicit checkpoints
    ss-asr-avg --out avg.npz result/exp/asr.snap-000001000.npz \
                             result/exp/asr.snap-000002000.npz

    # average the last K snapshots of a module in a checkpoint dir
    ss-asr-avg --out avg.npz --ckpdir result/exp --module asr --last 5
"""

from __future__ import annotations

import argparse

from ss_asr_tpu.utils import checkpoint as ckpt


def main(argv=None):
    parser = argparse.ArgumentParser(prog="ss_asr_tpu.avg_ckpt")
    parser.add_argument("checkpoints", nargs="*",
                        help="explicit checkpoint paths (.npz or .orbax)")
    parser.add_argument("--out", required=True,
                        help="output checkpoint path (.npz or .orbax)")
    parser.add_argument("--ckpdir", default=None,
                        help="checkpoint dir holding <module>.snap-* files")
    parser.add_argument("--module", default="asr",
                        help="module id whose snapshots to average (with --ckpdir)")
    parser.add_argument("--last", type=int, default=5,
                        help="how many most-recent snapshots to average (with --ckpdir)")
    args = parser.parse_args(argv)

    if bool(args.checkpoints) == bool(args.ckpdir):
        parser.error("give either explicit checkpoint paths OR --ckpdir, not both/neither")
    paths = args.checkpoints
    if args.ckpdir:
        if args.last < 1:
            parser.error("--last must be >= 1")
        snaps = ckpt.list_snapshots(args.ckpdir, args.module)
        if not snaps:
            parser.error(f"no {args.module}.snap-* checkpoints in {args.ckpdir} "
                         "(train with keep_snapshots: K to record them)")
        paths = [p for _, p in snaps[-args.last:]]

    tree = ckpt.average_pytrees(paths)
    ckpt.save_auto(args.out, tree)
    print(f"averaged {len(paths)} checkpoint(s) -> {args.out}")
    for p in paths:
        print(f"  {p}")


if __name__ == "__main__":
    main()
