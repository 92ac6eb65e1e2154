"""Optimizers: reference-parity Adadelta/Adam with clip + NaN-step skip.

The reference clips the global grad norm at 5 and *cancels the whole step*
when the norm is NaN (src/trainer.py:131-148).  ``optax.apply_if_finite``
reproduces the skip (optimizer accumulators untouched); clipping happens
inside, so a finite-but-huge norm is scaled exactly as torch's
``clip_grad_norm_``.

Subtree training (TAE updates the ASR's speller but not its listener, etc.)
uses ``optax.masked`` over a boolean pytree built from key-path predicates —
the TPU-native replacement for the reference's "pass these parameter lists to
the optimizer" pattern (src/trainer.py:634-641,790-794,943-951).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Sequence, Tuple

import jax
import optax


def make_schedule(
    learning_rate: float,
    warmup_steps: int = 0,
    decay_steps: int = 0,
    end_scale: float = 0.0,
):
    """Optional LR schedule (beyond-reference; the reference trains at a
    constant rate): linear warmup from 0 over ``warmup_steps``, then either
    constant (``decay_steps == 0``) or cosine decay over ``decay_steps``
    down to ``end_scale * learning_rate``. Returns a float (constant) or an
    optax schedule."""
    if not warmup_steps and not decay_steps:
        return learning_rate
    if decay_steps:
        # optax's decay_steps is the TOTAL schedule length INCLUDING warmup;
        # our config key is the cosine horizon AFTER warmup — convert
        return optax.warmup_cosine_decay_schedule(
            init_value=0.0 if warmup_steps else learning_rate,
            peak_value=learning_rate,
            warmup_steps=warmup_steps,
            decay_steps=warmup_steps + decay_steps,
            end_value=end_scale * learning_rate,
        )
    return optax.linear_schedule(
        init_value=0.0, end_value=learning_rate, transition_steps=warmup_steps
    )


def make_optimizer(
    opt_type: str,
    learning_rate: float,
    grad_clip: float = 5.0,
    eps: float = 1e-8,
    mask=None,
    accum_steps: int = 1,
    warmup_steps: int = 0,
    decay_steps: int = 0,
    end_scale: float = 0.0,
    update_scales: Optional[Sequence[Tuple[Dict, float]]] = None,
) -> optax.GradientTransformation:
    """Build '<Adadelta|Adam|SGD>' with clip-and-skip-NaN semantics.

    ``accum_steps > 1`` enables gradient accumulation (``opt.accum_steps``
    config key, beyond-reference): micro-batch gradients are AVERAGED over k
    calls and the clip + inner update run once per k — so k micro-batches of
    size B train exactly like one batch of k*B, for effective batches beyond
    per-chip memory. Composes with the DP/TP meshes (accumulation happens
    after the cross-device pmean).

    ``warmup_steps`` / ``decay_steps`` (``opt.warmup_steps`` /
    ``opt.decay_steps``) enable a warmup(+cosine-decay) LR schedule; with
    accumulation the schedule advances once per ACCUMULATED update, not per
    micro-batch (MultiSteps wraps the whole chain). ``end_scale``
    (``opt.end_scale``) sets the cosine floor as a fraction of the peak LR.

    ``update_scales``: optional ``[(bool_mask_tree, factor), ...]`` — after
    the inner update is computed, leaves selected by each mask have their
    update multiplied by ``factor`` (0.0 freezes them). Used for damped
    co-updates of shared subtrees (e.g. ``sae.listener_lr_scale``).
    """
    lr = make_schedule(learning_rate, warmup_steps, decay_steps, end_scale)
    t = opt_type.lower()
    if t == "adadelta":
        inner = optax.adadelta(learning_rate=lr, eps=eps)
    elif t == "adam":
        inner = optax.adam(learning_rate=lr, eps=eps)
    elif t == "sgd":
        inner = optax.sgd(learning_rate=lr)
    else:
        raise ValueError(f"Unknown optimizer type: {opt_type}")
    chain = optax.chain(optax.clip_by_global_norm(grad_clip), inner)
    if mask is not None:
        # optax.masked leaves the complement's updates untouched (i.e. raw
        # gradients would flow into frozen params) — zero them first, which
        # also keeps the clip norm computed over the trainable subtree only,
        # like the reference's per-trainer parameter lists.
        inv = jax.tree.map(lambda m: not m, mask)
        chain = optax.chain(
            optax.masked(optax.set_to_zero(), inv),
            optax.masked(chain, mask),
        )
    for scale_mask, factor in update_scales or ():
        chain = optax.chain(
            chain, optax.masked(optax.scale(float(factor)), scale_mask)
        )
    if accum_steps and int(accum_steps) > 1:
        chain = optax.MultiSteps(chain, every_k_schedule=int(accum_steps))
    # 10**8 consecutive non-finite steps before giving up ≈ "always skip"
    return optax.apply_if_finite(chain, max_consecutive_errors=10**8)


def path_mask(params: Dict, pred: Callable[[Tuple[str, ...]], bool]) -> Dict:
    """Boolean pytree: pred(path) per leaf, path = tuple of dict keys."""

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return bool(pred(path))

    return walk(params, ())


def prefix_mask(params: Dict, prefixes: Sequence[Tuple[str, ...]]) -> Dict:
    """True for leaves whose path starts with any of the given prefixes."""

    def pred(path):
        return any(path[: len(p)] == tuple(p) for p in prefixes)

    return path_mask(params, pred)


def global_norm(tree) -> jax.Array:
    return optax.global_norm(tree)
