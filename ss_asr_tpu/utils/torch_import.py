"""Import/export of reference (cadia-lvl/ss_asr) PyTorch checkpoints.

The reference saves each module as ``torch.save(module.state_dict(), path)``
to ``<ckpdir>/<name>/<module_id>.cpt`` (src/trainer.py:70-71,183).  This
module converts those state_dicts to/from our parameter pytrees so a user
migrating from the reference keeps their trained weights:

* torch ``nn.Linear`` stores ``weight [out, in]``; ours is ``w [in, out]``.
* torch LSTM/GRU input/hidden weights are ``[gates*H, in]``; ours are
  transposed.  Gate order already matches (ops/rnn.py follows the torch
  convention: LSTM i,f,g,o — GRU r,z,n).
* torch LSTM carries two bias vectors (``bias_ih + bias_hh``) that are only
  ever summed; ours merges them into one ``b``.  GRU cells keep both (the
  ``n`` gate needs them separate).
* torch ``Conv2d`` weights are OIHW; ours are HWIO.  The reference's convs
  are ``bias=False`` (src/speech_autoencoder.py:116-147) so there is no
  conv-bias/BatchNorm folding question.

State-dict key structure per module (from the reference model definitions):

* ASR (src/asr.py:31-44): ``encoder.blstm_{1,2,3}.layer.*`` (pBLSTM wraps its
  LSTM in ``.layer``), ``encoder.blstm_4.*`` (bare bidirectional LSTM),
  ``attention.{phi,psi}.*``, ``decoder.layer_{1,2}.*`` (LSTMCells),
  ``embed.weight``, ``char_trans.*``.
* CharLM (src/charlm.py:26-44): ``emb.weight``, ``layer_{1,2}.*`` (GRUCells),
  ``out.*``.
* TextAutoEncoder (src/text_autoencoder.py:96-108): ``encoder.emb.weight``,
  ``encoder.blstm.*_l{0,1}[_reverse]`` (2-layer bidirectional LSTM).
* SpeechAutoEncoder (src/speech_autoencoder.py:116-192):
  ``encoder.conv_{1,2,3}.{0,1}.*`` (Conv2d then BatchNorm2d inside
  Sequential), ``decoder.core.{0,2,4}.*`` (Linear/LeakyReLU stack).
* Discriminator (src/discriminator.py:38-43): ``core.{0,2,4}.*``.

Loading ``.cpt`` files requires torch (imported lazily; everything else is
numpy).  Export writes the same key names back so reference tooling can read
our weights; the merged LSTM bias is emitted as ``bias_ih`` with a zero
``bias_hh`` (torch only ever adds them).
"""

from __future__ import annotations

import os
from typing import Dict, Tuple

import numpy as np

Flat = Dict[str, np.ndarray]


# ---------------------------------------------------------------------------
# Primitive converters (torch layout -> ours)
# ---------------------------------------------------------------------------

def _t(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(a, dtype=np.float32).T)


def _f(a: np.ndarray) -> np.ndarray:
    return np.asarray(a, dtype=np.float32)


def _linear_from(sd: Flat, prefix: str) -> Dict:
    p = {"w": _t(sd[prefix + ".weight"])}
    if prefix + ".bias" in sd:
        p["b"] = _f(sd[prefix + ".bias"])
    return p


def _lstm_layer_from(sd: Flat, prefix: str, suffix: str) -> Dict:
    """One direction of an ``nn.LSTM`` layer (suffix '' or '_reverse')."""
    return {
        "w_ih": _t(sd[f"{prefix}.weight_ih_{suffix}"]),
        "w_hh": _t(sd[f"{prefix}.weight_hh_{suffix}"]),
        "b": _f(sd[f"{prefix}.bias_ih_{suffix}"]) + _f(sd[f"{prefix}.bias_hh_{suffix}"]),
    }


def _bilstm_from(sd: Flat, prefix: str, layer: int = 0) -> Dict:
    return {
        "fwd": _lstm_layer_from(sd, prefix, f"l{layer}"),
        "bwd": _lstm_layer_from(sd, prefix, f"l{layer}_reverse"),
    }


def _lstmcell_from(sd: Flat, prefix: str) -> Dict:
    return {
        "w_ih": _t(sd[prefix + ".weight_ih"]),
        "w_hh": _t(sd[prefix + ".weight_hh"]),
        "b": _f(sd[prefix + ".bias_ih"]) + _f(sd[prefix + ".bias_hh"]),
    }


def _grucell_from(sd: Flat, prefix: str) -> Dict:
    return {
        "w_ih": _t(sd[prefix + ".weight_ih"]),
        "w_hh": _t(sd[prefix + ".weight_hh"]),
        "b_ih": _f(sd[prefix + ".bias_ih"]),
        "b_hh": _f(sd[prefix + ".bias_hh"]),
    }


def _conv_hwio_from(sd: Flat, key: str) -> np.ndarray:
    # torch OIHW -> our HWIO
    return np.ascontiguousarray(np.asarray(sd[key], dtype=np.float32).transpose(2, 3, 1, 0))


# ---------------------------------------------------------------------------
# Per-module importers
# ---------------------------------------------------------------------------

def import_asr(sd: Flat) -> Dict:
    """Reference ``ASR.state_dict()`` -> ``models.las`` param pytree."""
    enc = {
        "pblstm1": _bilstm_from(sd, "encoder.blstm_1.layer"),
        "pblstm2": _bilstm_from(sd, "encoder.blstm_2.layer"),
        "pblstm3": _bilstm_from(sd, "encoder.blstm_3.layer"),
        "blstm4": _bilstm_from(sd, "encoder.blstm_4"),
    }
    return {
        "encoder": enc,
        "attention": {
            "phi": _linear_from(sd, "attention.phi"),
            "psi": _linear_from(sd, "attention.psi"),
        },
        "decoder": {
            "layer1": _lstmcell_from(sd, "decoder.layer_1"),
            "layer2": _lstmcell_from(sd, "decoder.layer_2"),
        },
        "embed": {"table": _f(sd["embed.weight"])},
        "char_trans": _linear_from(sd, "char_trans"),
    }


def import_charlm(sd: Flat) -> Dict:
    return {
        "emb": {"table": _f(sd["emb.weight"])},
        "gru1": _grucell_from(sd, "layer_1"),
        "gru2": _grucell_from(sd, "layer_2"),
        "out": _linear_from(sd, "out"),
    }


def import_tae(sd: Flat) -> Dict:
    return {
        "encoder": {
            "emb": {"table": _f(sd["encoder.emb.weight"])},
            "bilstm1": _bilstm_from(sd, "encoder.blstm", layer=0),
            "bilstm2": _bilstm_from(sd, "encoder.blstm", layer=1),
        }
    }


def import_sae(sd: Flat) -> Tuple[Dict, Dict]:
    """-> (params, bn_state) matching ``models.speech_autoencoder.init_sae``."""
    params: Dict = {"encoder": {}, "decoder": {}}
    bn_state: Dict = {}
    for i in (1, 2, 3):
        conv = f"encoder.conv_{i}"
        params["encoder"][f"conv{i}"] = {
            "w": _conv_hwio_from(sd, f"{conv}.0.weight"),
            "bn_scale": _f(sd[f"{conv}.1.weight"]),
            "bn_bias": _f(sd[f"{conv}.1.bias"]),
        }
        bn_state[f"conv{i}"] = {
            "mean": _f(sd[f"{conv}.1.running_mean"]),
            "var": _f(sd[f"{conv}.1.running_var"]),
        }
    for ours, theirs in (("fc1", "0"), ("fc2", "2"), ("fc3", "4")):
        params["decoder"][ours] = _linear_from(sd, f"decoder.core.{theirs}")
    return params, bn_state


def import_discriminator(sd: Flat) -> Dict:
    return {
        ours: _linear_from(sd, f"core.{theirs}")
        for ours, theirs in (("fc1", "0"), ("fc2", "2"), ("fc3", "4"))
    }


# ---------------------------------------------------------------------------
# Exporters (ours -> torch key names)
# ---------------------------------------------------------------------------

def _linear_to(p: Dict, prefix: str, out: Flat) -> None:
    out[prefix + ".weight"] = _t(p["w"])
    if "b" in p:
        out[prefix + ".bias"] = _f(p["b"])


def _lstm_layer_to(p: Dict, prefix: str, suffix: str, out: Flat) -> None:
    out[f"{prefix}.weight_ih_{suffix}"] = _t(p["w_ih"])
    out[f"{prefix}.weight_hh_{suffix}"] = _t(p["w_hh"])
    out[f"{prefix}.bias_ih_{suffix}"] = _f(p["b"])
    out[f"{prefix}.bias_hh_{suffix}"] = np.zeros_like(_f(p["b"]))


def _bilstm_to(p: Dict, prefix: str, layer: int, out: Flat) -> None:
    _lstm_layer_to(p["fwd"], prefix, f"l{layer}", out)
    _lstm_layer_to(p["bwd"], prefix, f"l{layer}_reverse", out)


def _lstmcell_to(p: Dict, prefix: str, out: Flat) -> None:
    out[prefix + ".weight_ih"] = _t(p["w_ih"])
    out[prefix + ".weight_hh"] = _t(p["w_hh"])
    out[prefix + ".bias_ih"] = _f(p["b"])
    out[prefix + ".bias_hh"] = np.zeros_like(_f(p["b"]))


def _grucell_to(p: Dict, prefix: str, out: Flat) -> None:
    out[prefix + ".weight_ih"] = _t(p["w_ih"])
    out[prefix + ".weight_hh"] = _t(p["w_hh"])
    out[prefix + ".bias_ih"] = _f(p["b_ih"])
    out[prefix + ".bias_hh"] = _f(p["b_hh"])


def export_asr(params: Dict) -> Flat:
    out: Flat = {}
    enc = params["encoder"]
    _bilstm_to(enc["pblstm1"], "encoder.blstm_1.layer", 0, out)
    _bilstm_to(enc["pblstm2"], "encoder.blstm_2.layer", 0, out)
    _bilstm_to(enc["pblstm3"], "encoder.blstm_3.layer", 0, out)
    _bilstm_to(enc["blstm4"], "encoder.blstm_4", 0, out)
    _linear_to(params["attention"]["phi"], "attention.phi", out)
    _linear_to(params["attention"]["psi"], "attention.psi", out)
    _lstmcell_to(params["decoder"]["layer1"], "decoder.layer_1", out)
    _lstmcell_to(params["decoder"]["layer2"], "decoder.layer_2", out)
    out["embed.weight"] = _f(params["embed"]["table"])
    _linear_to(params["char_trans"], "char_trans", out)
    return out


def export_charlm(params: Dict) -> Flat:
    out: Flat = {}
    out["emb.weight"] = _f(params["emb"]["table"])
    _grucell_to(params["gru1"], "layer_1", out)
    _grucell_to(params["gru2"], "layer_2", out)
    _linear_to(params["out"], "out", out)
    return out


def export_tae(params: Dict) -> Flat:
    out: Flat = {}
    out["encoder.emb.weight"] = _f(params["encoder"]["emb"]["table"])
    _bilstm_to(params["encoder"]["bilstm1"], "encoder.blstm", 0, out)
    _bilstm_to(params["encoder"]["bilstm2"], "encoder.blstm", 1, out)
    return out


def export_sae(params: Dict, bn_state: Dict) -> Flat:
    out: Flat = {}
    for i in (1, 2, 3):
        conv = params["encoder"][f"conv{i}"]
        out[f"encoder.conv_{i}.0.weight"] = np.ascontiguousarray(
            _f(conv["w"]).transpose(3, 2, 0, 1)  # HWIO -> OIHW
        )
        out[f"encoder.conv_{i}.1.weight"] = _f(conv["bn_scale"])
        out[f"encoder.conv_{i}.1.bias"] = _f(conv["bn_bias"])
        out[f"encoder.conv_{i}.1.running_mean"] = _f(bn_state[f"conv{i}"]["mean"])
        out[f"encoder.conv_{i}.1.running_var"] = _f(bn_state[f"conv{i}"]["var"])
        out[f"encoder.conv_{i}.1.num_batches_tracked"] = np.asarray(0, dtype=np.int64)
    for ours, theirs in (("fc1", "0"), ("fc2", "2"), ("fc3", "4")):
        _linear_to(params["decoder"][ours], f"decoder.core.{theirs}", out)
    return out


def export_discriminator(params: Dict) -> Flat:
    out: Flat = {}
    for ours, theirs in (("fc1", "0"), ("fc2", "2"), ("fc3", "4")):
        _linear_to(params[ours], f"core.{theirs}", out)
    return out


# ---------------------------------------------------------------------------
# File-level API
# ---------------------------------------------------------------------------

def detect_module(sd: Flat) -> str:
    """Identify which reference module a state_dict belongs to by its keys."""
    keys = set(sd)
    if any(k.startswith("encoder.blstm_1") for k in keys):
        return "asr"
    if "layer_1.weight_ih" in keys and "emb.weight" in keys:
        return "char_lm"
    if any(k.startswith("encoder.conv_1") for k in keys):
        return "sae"
    if any(k.startswith("encoder.blstm.") for k in keys):
        return "tae"
    if "core.0.weight" in keys:
        return "adv"
    raise ValueError(
        "unrecognized state_dict (keys: %s ...)" % sorted(keys)[:5]
    )


def load_torch_state(path: str) -> Flat:
    """Read a ``torch.save``-d state_dict into plain numpy arrays."""
    import torch

    try:
        sd = torch.load(path, map_location="cpu", weights_only=True)
    except TypeError:
        # torch < 1.13 (the versions the reference pins) has no weights_only
        sd = torch.load(path, map_location="cpu")
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v) for k, v in sd.items()}


def import_state(sd: Flat, module: str | None = None) -> Tuple[str, Dict]:
    """Convert a reference state_dict to the tree our checkpoints store.

    Returns ``(module_id, tree)`` where the tree is exactly what
    ``Solver.save_tree`` writes for that module id (the SAE tree carries
    ``{"params", "bn_state"}``; ``adv`` is the discriminator).
    """
    module = module or detect_module(sd)
    if module == "asr" or module.startswith("asr_"):
        return module, import_asr(sd)
    if module == "char_lm":
        return module, import_charlm(sd)
    if module == "tae":
        return module, import_tae(sd)
    if module == "sae":
        params, bn_state = import_sae(sd)
        return module, {"params": params, "bn_state": bn_state}
    if module in ("adv", "discriminator"):
        return "adv", import_discriminator(sd)
    raise ValueError(f"unknown module id: {module}")


def import_checkpoint(path: str, module: str | None = None) -> Tuple[str, Dict]:
    """Load a reference ``.cpt`` file and convert it (see import_state).

    Without ``module``, the state_dict's keys decide what it is, and the
    filename is only cross-checked (``asr_1.cpt`` relay names keep their
    stem as the module id).  A caller-supplied ``module`` is trusted as-is —
    the escape hatch for unrecognizable key layouts.
    """
    sd = load_torch_state(path)
    if module is not None:
        return import_state(sd, "adv" if module == "discriminator" else module)
    detected = detect_module(sd)
    stem = os.path.basename(path).rsplit(".", 1)[0].removesuffix("_best")
    if stem == "asr" or stem.startswith("asr_"):
        if detected != "asr":
            raise ValueError(
                f"{path} is named like an ASR checkpoint but holds a "
                f"'{detected}' state_dict"
            )
        return import_state(sd, stem)  # relay names (asr_1, ...) survive
    if stem in ("char_lm", "tae", "sae", "adv", "discriminator"):
        base = "adv" if stem == "discriminator" else stem
        if base != detected:
            raise ValueError(
                f"{path} is named like a '{stem}' checkpoint but holds a "
                f"'{detected}' state_dict"
            )
    return import_state(sd, detected)
