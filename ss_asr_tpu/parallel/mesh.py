"""Device mesh, sharding rules, and data-parallel step wrappers.

The reference has no distributed backend at all (SURVEY.md §2.3); this module
is the TPU-native surface the rebuild adds:

* a 2-axis ``jax.sharding.Mesh`` — ``data`` (batch parallelism over ICI) and
  ``model`` (tensor parallelism of the wide gate/projection matmuls);
* PartitionSpec rules mapping any of this framework's param pytrees onto the
  mesh (gate matrices ``[in, 4H]`` split over ``model`` on the 4H dim, and so
  on), with single-chip as the degenerate 1x1 mesh;
* helpers to place batches (sharded over ``data``) and params, after which
  ``jax.jit`` + GSPMD insert the all-reduces (gradient psum over ``data``,
  activation collectives over ``model``) — no hand-written NCCL-style code.

Multi-chip behavior is testable anywhere via
``--xla_force_host_platform_device_count=N`` CPU devices.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: Optional[int] = None,
    n_model: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a (data, model) mesh; defaults to all devices on the data axis."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model <= n, f"mesh {n_data}x{n_model} > {n} devices"
    arr = np.array(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def _divisible(dim: int, shards: int) -> bool:
    return shards > 0 and dim % shards == 0


def param_pspec(path_leaf_shape, n_model: int) -> P:
    """PartitionSpec for one parameter array under tensor parallelism.

    Rule: shard the widest dimension that is divisible by the model-axis size,
    preferring the *output/gate* dimension (last axis) — that is where this
    framework's matmuls are wide (4H gate projections, vocab logits, mel
    bases).  Everything else is replicated.
    """
    shape = path_leaf_shape
    if n_model <= 1 or len(shape) < 2:
        return P()
    if _divisible(shape[-1], n_model):
        return P(*([None] * (len(shape) - 1) + [MODEL_AXIS]))
    if _divisible(shape[0], n_model):
        return P(*([MODEL_AXIS] + [None] * (len(shape) - 1)))
    return P()


def param_shardings(params: Dict, mesh: Mesh) -> Dict:
    """Tree of NamedShardings for a param pytree (TP over MODEL_AXIS)."""
    n_model = mesh.shape[MODEL_AXIS]
    return jax.tree.map(
        lambda p: NamedSharding(mesh, param_pspec(p.shape, n_model)), params
    )


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) dim over DATA_AXIS."""
    return NamedSharding(mesh, P(*([DATA_AXIS] + [None] * (ndim - 1))))


def shard_params(params: Dict, mesh: Mesh) -> Dict:
    return jax.device_put(params, param_shardings(params, mesh))


def shard_batch(tree, mesh: Mesh):
    """Place every array in ``tree`` with its batch dim over DATA_AXIS."""
    return jax.tree.map(
        lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), tree
    )


def shard_map_grads(grads_fn, mesh: Mesh, n_batch_args: int):
    """Explicit-SPMD data parallelism for a gradient function.

    ``grads_fn(params, *batch_args) -> (loss, grads)`` runs per device on its
    local batch shard (params replicated); loss and grads are pmean-ed over
    DATA_AXIS.  Unlike jit+GSPMD sharding, every op inside — including Pallas
    kernels, which GSPMD cannot partition — sees plain local arrays, so this
    is the multi-chip path that composes with the fused LSTM/decode kernels.
    """
    from jax import lax, shard_map

    def local_fn(params, *batch):
        loss, grads = grads_fn(params, *batch)
        loss = lax.pmean(loss, DATA_AXIS)
        grads = jax.tree.map(lambda g: lax.pmean(g, DATA_AXIS), grads)
        return loss, grads

    return shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(),) + tuple(P(DATA_AXIS) for _ in range(n_batch_args)),
        out_specs=(P(), P()),
        # scan carries start replicated and become device-varying after the
        # first step; skip the varying-axis check rather than pcast every init
        check_vma=False,
    )


def dp_train_step(mesh: Mesh, local_grads, optim, n_batch_args: int,
                  aux_specs=None, fold_key: bool = True,
                  compiler_options=None):
    """Build a full data-parallel train step: one ``shard_map`` inside ``jit``.

    ``local_grads(params, *batch_args, key) -> (loss, grads, aux)`` runs per
    device on its local batch shard (params/opt state replicated); loss and
    grads are pmean-ed over DATA_AXIS, then the optimizer update runs
    replicated on every device — so params stay replicated with zero extra
    collectives.  ``aux`` is a pytree of batch-leading arrays (or ``None``)
    returned still sharded over DATA_AXIS.

    This is the multi-chip path that composes with the Pallas kernels: inside
    shard_map every op sees plain local arrays (mesh axes are Manual), so the
    fused LSTM / attend-and-spell kernels run unmodified per chip.

    Returns ``step(params, opt_state, *batch_args, key) ->
    (params, opt_state, loss, aux)`` — jitted, params/opt_state donated.
    """
    import functools

    from jax import lax, shard_map

    def local_fn(params, opt_state, key, *batch):
        if fold_key:
            key = jax.random.fold_in(key, lax.axis_index(DATA_AXIS))
        loss, grads, aux = local_grads(params, *batch, key)
        loss = lax.pmean(loss, DATA_AXIS)
        grads = jax.tree.map(lambda g: lax.pmean(g, DATA_AXIS), grads)
        updates, opt_state = optim.update(grads, opt_state, params)
        params = jax.tree.map(lambda p, u: p + u, params, updates)
        return params, opt_state, loss, aux

    if aux_specs is None:
        aux_specs = P(DATA_AXIS)
    sharded = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(), P(), P()) + tuple(P(DATA_AXIS) for _ in range(n_batch_args)),
        out_specs=(P(), P(), P(), aux_specs),
        check_vma=False,
    )

    @functools.partial(jax.jit, donate_argnums=(0, 1),
                       compiler_options=compiler_options)
    def step(params, opt_state, *args):
        *batch, key = args
        return sharded(params, opt_state, key, *batch)

    return step


def dp_eval_step(mesh: Mesh, local_fn, n_batch_args: int, n_rep_args: int = 0,
                 out_specs=None, compiler_options=None):
    """Data-parallel eval: ``local_fn(params, *batch_args, *rep_args)``.

    ``batch_args`` are sharded over DATA_AXIS; ``rep_args`` (e.g. PRNG keys)
    are replicated. Outputs are batch-leading arrays returned sharded over
    DATA_AXIS by default — gather on host with ``np.asarray``; local_fn may
    ``lax.pmean(..., DATA_AXIS)`` scalars itself and declare ``P()`` for them
    via ``out_specs``.
    """
    from jax import shard_map

    if out_specs is None:
        out_specs = P(DATA_AXIS)
    sharded = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(P(),)
        + tuple(P(DATA_AXIS) for _ in range(n_batch_args))
        + tuple(P() for _ in range(n_rep_args)),
        out_specs=out_specs,
        check_vma=False,
    )
    return jax.jit(sharded, compiler_options=compiler_options)


def pad_batch_to(tree, batch: int):
    """Pad every array's leading dim up to ``batch`` (repeat-last) so the
    global batch divides the data axis; returns (tree, n_valid)."""

    def pad(x):
        x = np.asarray(x)
        if x.shape[0] >= batch:
            return x[:batch]
        reps = np.repeat(x[-1:], batch - x.shape[0], axis=0)
        return np.concatenate([x, reps], axis=0)

    n_valid = min(batch, jax.tree.leaves(tree)[0].shape[0])
    return jax.tree.map(pad, tree), n_valid
