"""Convert reference (cadia-lvl/ss_asr) torch checkpoints to our format.

    python -m ss_asr_tpu.cli.import_ckpt <src> <dest_dir> [--module ID]
    python -m ss_asr_tpu.cli.import_ckpt result/myrun/ result_tpu/myrun/

``src`` is a single ``.cpt`` file or a reference checkpoint directory
(``<ckpdir>/<name>/`` holding ``asr.cpt``, ``asr_best.cpt``, ``char_lm.cpt``,
relay files ``asr_1.cpt`` .., src/trainer.py:58-71).  Each recognized file is
converted to ``<dest_dir>/<module_id>[_best].npz`` — exactly what our
trainers load — so a reference user keeps their trained weights when
switching.  ``tracker.json`` is copied verbatim (same schema).

The reverse direction (our .npz -> reference-keyed torch .cpt) is
``--export``: useful for validating a TPU-trained model with reference-side
tooling.
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

from ss_asr_tpu.utils import checkpoint as ckpt
from ss_asr_tpu.utils import torch_import as ti


def _convert_file(src: str, dest_dir: str, module: str | None) -> str:
    mid, tree = ti.import_checkpoint(src, module=module)
    stem = os.path.basename(src).rsplit(".", 1)[0]
    if module is not None:
        # a forced module id names the output so our trainers find it,
        # whatever the source file was called
        stem = mid + ("_best" if stem.endswith("_best") else "")
    # otherwise keep the reference's file naming (asr_best.cpt ->
    # asr_best.npz) so best-checkpoint semantics survive the migration
    out = os.path.join(dest_dir, stem + ".npz")
    ckpt.save_pytree(out, tree)
    return out


def _export_file(src: str, dest_dir: str, module: str | None) -> str:
    import numpy as np
    import torch

    tree = ckpt.load_auto(src)
    stem = os.path.basename(src).rsplit(".", 1)[0]
    mid = module or (stem.removesuffix("_best"))
    base = "asr" if mid.startswith("asr") else mid
    if base == "asr":
        flat = ti.export_asr(tree)
    elif base == "char_lm":
        flat = ti.export_charlm(tree)
    elif base == "tae":
        flat = ti.export_tae(tree)
    elif base == "sae":
        flat = ti.export_sae(tree["params"], tree["bn_state"])
    elif base in ("adv", "discriminator"):
        flat = ti.export_discriminator(tree)
    else:
        raise ValueError(f"unknown module id: {mid} (pass --module)")
    out = os.path.join(dest_dir, stem + ".cpt")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in flat.items()}, out)
    return out


def main(argv=None):
    parser = argparse.ArgumentParser(prog="ss_asr_tpu.import_ckpt")
    parser.add_argument("src", help=".cpt file or reference ckpt directory")
    parser.add_argument("dest", help="output directory")
    parser.add_argument("--module", default=None,
                        help="force the module id (default: detect)")
    parser.add_argument("--export", action="store_true",
                        help="reverse direction: our .npz -> torch .cpt")
    args = parser.parse_args(argv)

    in_ext = ".npz" if args.export else ".cpt"
    convert = _export_file if args.export else _convert_file

    if os.path.isfile(args.src):
        files = [args.src]
    elif os.path.isdir(args.src):
        if args.module is not None:
            print("--module only applies to a single file, not a directory "
                  "(a directory holds several module kinds)", file=sys.stderr)
            return 1
        files = sorted(
            os.path.join(args.src, f)
            for f in os.listdir(args.src)
            # *_opt.npz are optimizer-state archives (train/solver.py), not
            # model checkpoints — nothing to export there
            if f.endswith(in_ext) and not f.endswith("_opt.npz")
        )
        if not files:
            print(f"no {in_ext} files in {args.src}", file=sys.stderr)
            return 1
    else:
        print(f"no such file or directory: {args.src}", file=sys.stderr)
        return 1
    os.makedirs(args.dest, exist_ok=True)
    n_err = 0
    for f in files:
        try:
            out = convert(f, args.dest, args.module)
            print(f"{f} -> {out}")
        except Exception as e:  # keep going; report at the end
            print(f"SKIP {f}: {e}", file=sys.stderr)
            n_err += 1
    tracker = os.path.join(args.src, "tracker.json") if os.path.isdir(args.src) else None
    if tracker and os.path.isfile(tracker) and not args.export:
        shutil.copy(tracker, os.path.join(args.dest, "tracker.json"))
        print(f"{tracker} -> {os.path.join(args.dest, 'tracker.json')}")
    return 1 if n_err else 0


if __name__ == "__main__":
    sys.exit(main())
