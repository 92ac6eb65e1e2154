"""Generic batch-dim custom_partitioning for Pallas kernels.

A Pallas kernel has no GSPMD partitioning by default, so jit auto-sharding
either fails or forces a fallback. Every kernel in this framework is
embarrassingly parallel over the utterance batch; this helper declares that:
each operand's batch dimension (or None for replicated weights/constants)
shards over whatever mesh axis the caller put on the first batched operand,
everything else replicates, and the kernel body runs per shard on local
arrays. The time/decode-step axes stay unsharded (sequential recurrences).

Used by ops/pallas/lstm.py and ops/pallas/spell.py.
"""

from __future__ import annotations

from typing import Optional, Sequence

from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P


def _axis_of(arg_info, dim: Optional[int]):
    if dim is None:
        return None
    sh = getattr(arg_info, "sharding", None)
    spec = getattr(sh, "spec", None)
    if spec is None or len(spec) <= dim:
        return None
    return spec[dim]


def _spec(ndim: int, dim: Optional[int], axis) -> P:
    parts = [None] * ndim
    if dim is not None and axis is not None:
        parts[dim] = axis
    return P(*parts)


def batch_partitioned(
    fn,
    in_batch_dims: Sequence[Optional[int]],
    out_batch_dims: Sequence[Optional[int]],
    rule: str,
):
    """Wrap ``fn(*arrays) -> tuple`` with a batch-parallel partition rule.

    ``in_batch_dims[i]`` / ``out_batch_dims[j]`` name the batch dimension of
    each operand/result (None = fully replicated). ``rule`` is the shardy
    einsum-like sharding rule string for the same signature.
    """
    in_batch_dims = tuple(in_batch_dims)
    out_batch_dims = tuple(out_batch_dims)

    cp = custom_partitioning(lambda *args: fn(*args))

    def _shardings(mesh, arg_infos):
        axis = None
        for info, dim in zip(arg_infos, in_batch_dims):
            axis = _axis_of(info, dim)
            if axis is not None:
                break
        args = tuple(
            NamedSharding(mesh, _spec(len(info.shape), dim, axis))
            for info, dim in zip(arg_infos, in_batch_dims)
        )
        return args, axis

    def infer(mesh, arg_infos, result_infos):
        _, axis = _shardings(mesh, arg_infos)
        return tuple(
            NamedSharding(mesh, _spec(len(ri.shape), dim, axis))
            for ri, dim in zip(result_infos, out_batch_dims)
        )

    def partition(mesh, arg_infos, result_infos):
        args, axis = _shardings(mesh, arg_infos)
        outs = tuple(
            NamedSharding(mesh, _spec(len(ri.shape), dim, axis))
            for ri, dim in zip(result_infos, out_batch_dims)
        )

        def lower(*local_args):
            return fn(*local_args)

        return mesh, lower, outs, args

    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=rule,
    )
    return cp
