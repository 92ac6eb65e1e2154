"""Pallas TPU kernels: fused LSTM time loop, forward AND backward.

The recurrence is the sequential core of this framework (pyramidal
listener = ~1000 cell steps per utterance batch).  XLA's ``lax.scan``
emits one fused loop, but every step still round-trips the [B, 4H] gate
block through the generic fusion path.  These kernels keep the recurrent
weights ``W_hh`` and the (h, c) carries resident in VMEM for the whole
sequence and stream the precomputed input projections
``Gx[t] = x_t @ W_ih + b`` through the grid pipeline (auto double-buffered
HBM->VMEM), so each step is exactly one MXU matmul plus VPU gate math —
measured at the MXU row-streaming floor (~0.5 us/step at B=32, H=256;
docs/PERF.md round 3).

Training path: ``lstm_scan_pallas_trainable`` — custom-VJP with
hand-written forward and reverse-time backward kernels (unpacked residual
streams + chunk-boundary sidecars), ``reverse=True`` for the backward
BiLSTM direction via kernel index mirroring (no reverse_sequence
gathers), adaptive DMA chunking for large batches (``_chunk_for``), and
batch-parallel GSPMD partition rules so jit+auto-sharding keeps the
kernels fused.

Semantics match ``ops.rnn.lstm_scan``: packed-sequence masking (carry
freezes, outputs zero past each sample's length).  ``lstm_seq_pallas`` is
the forward-only variant for decode/eval paths.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lstm_kernel(len_ref, gx_ref, whh_ref, y_ref, h_ref, c_ref, *rest):
    """One grid step == one time step.  Carries (h, c) live in VMEM scratch."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        h_ref[:] = jnp.zeros_like(h_ref)
        c_ref[:] = jnp.zeros_like(c_ref)

    if rest:  # wide H: W_hh arrives via one explicit DMA into scratch
        whh_vmem, sem = rest
        _load_whh(t, whh_ref, whh_vmem, sem)
        whh_ref = whh_vmem

    h = h_ref[:]
    c = c_ref[:]
    gates = gx_ref[0] + jnp.dot(
        h.astype(whh_ref.dtype), whh_ref[:], preferred_element_type=jnp.float32
    )
    H = h.shape[-1]
    i = jax.nn.sigmoid(gates[:, :H])
    f = jax.nn.sigmoid(gates[:, H : 2 * H])
    g = jnp.tanh(gates[:, 2 * H : 3 * H])
    o = jax.nn.sigmoid(gates[:, 3 * H :])
    c2 = f * c + i * g
    h2 = o * jnp.tanh(c2)

    valid = (t < len_ref[:, 0])[:, None]  # [B, 1]
    h_ref[:] = jnp.where(valid, h2, h)
    c_ref[:] = jnp.where(valid, c2, c)
    y_ref[0] = jnp.where(valid, h2, 0.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def lstm_seq_pallas(
    gates_x: jax.Array,
    whh: jax.Array,
    lengths: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Run the fused LSTM loop.

    Args:
      gates_x: [T, B, 4H] precomputed ``x @ W_ih + b`` (time-major).
      whh: [H, 4H] recurrent weights.
      lengths: [B] int32 valid lengths.
      interpret: run in interpreter mode (for CPU tests).

    Returns y: [T, B, H] hidden states (zeros past each length).
    """
    T, B, G = gates_x.shape
    H = G // 4
    whh = whh.astype(_wdt(H))  # wide H: bf16 keeps the resident block in VMEM
    lengths2d = lengths.astype(jnp.int32).reshape(B, 1)

    whh_stream = H >= WEIGHT_BF16_MIN_H
    scratch = [
        pltpu.VMEM((B, H), jnp.float32),
        pltpu.VMEM((B, H), jnp.float32),
    ]
    if whh_stream:
        whh_spec = _whh_any_spec()
        scratch += [pltpu.VMEM((H, G), whh.dtype), pltpu.SemaphoreType.DMA]
    else:
        whh_spec = pl.BlockSpec((H, G), lambda t: (0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(T,),
        in_specs=[
            # lengths as a [B, 1] VMEM vector (SMEM loads must be scalar)
            pl.BlockSpec((B, 1), lambda t: (0, 0)),
            pl.BlockSpec((1, B, G), lambda t: (t, 0, 0)),
            whh_spec,
        ],
        out_specs=pl.BlockSpec((1, B, H), lambda t: (t, 0, 0)),
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        _lstm_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, B, H), jnp.float32),
        interpret=interpret,
    )(lengths2d, gates_x, whh)


#: time steps per grid block — amortizes DMA issue overhead across CHUNK
#: steps (per-step blocks spend more time launching copies than computing)
CHUNK = 8


def _whh_any_spec():
    """Wide-H weight placement: leave ``W_hh`` in compiler-chosen (HBM)
    memory and DMA it ONCE into a single VMEM scratch at grid step 0.
    Measured NEUTRAL on the compiler's scoped-VMEM accounting (the H=768
    full-model request was 17.84 MB with either placement), so the fit
    comes from the bf16 weight + small chunks + the raised limit — this
    spec is kept because it guarantees exactly one resident copy at
    runtime (a pipelined in_spec's buffering is the compiler's choice)
    and it is the placement every wide-H configuration was verified
    with on-chip."""
    return pl.BlockSpec(memory_space=pl.ANY)


def _load_whh(k, whh_ref, whh_vmem, sem):
    @pl.when(k == 0)
    def _():
        dma = pltpu.make_async_copy(whh_ref, whh_vmem, sem)
        dma.start()
        dma.wait()


def _make_fwd_kernel(reverse: bool, whh_stream: bool = False):
    """Forward over one CHUNK of time steps; streams out h and c states
    (backward residuals).

    ``gx``/``whh`` may arrive in bf16 (halved HBM/VMEM traffic, faster MXU
    pass); the recurrent matmul accumulates in f32 and the carries stay f32.

    ``reverse=True`` runs the backward *direction* of a BiLSTM natively:
    the grid streams chunks newest-first (index_map) and the inner loop
    mirrors, so time is processed T-1..0. Padding (t >= len) comes first in
    that order and freezes the zero carry, which is EXACTLY packed-reverse
    semantics — no reverse_sequence gathers on either side (each one is a
    [B, T, F] take_along_axis round trip through HBM; with its custom-VJP
    twin the old path paid four per direction-layer).
    """

    def kernel(len_ref, gx_ref, whh_ref, y_ref, cs_ref, h_ref, c_ref, *rest):
        k = pl.program_id(0)
        C = gx_ref.shape[0]
        Tc = pl.num_programs(0)

        @pl.when(k == 0)
        def _():
            h_ref[:] = jnp.zeros_like(h_ref)
            c_ref[:] = jnp.zeros_like(c_ref)

        if whh_stream:
            whh_vmem, sem = rest
            _load_whh(k, whh_ref, whh_vmem, sem)
            whh_ref = whh_vmem

        def step(j, _):
            if reverse:
                i = C - 1 - j
                t = (Tc - 1 - k) * C + i  # true time index of this row
            else:
                i = j
                t = k * C + i
            h = h_ref[:]
            c = c_ref[:]
            gates = gx_ref[i].astype(jnp.float32) + jnp.dot(
                h.astype(whh_ref.dtype), whh_ref[:],
                preferred_element_type=jnp.float32,
            )
            H = h.shape[-1]
            ii = jax.nn.sigmoid(gates[:, :H])
            f = jax.nn.sigmoid(gates[:, H : 2 * H])
            g = jnp.tanh(gates[:, 2 * H : 3 * H])
            o = jax.nn.sigmoid(gates[:, 3 * H :])
            c2 = f * c + ii * g
            h2 = o * jnp.tanh(c2)
            valid = (t < len_ref[:, 0])[:, None]
            h_new = jnp.where(valid, h2, h)
            c_new = jnp.where(valid, c2, c)
            h_ref[:] = h_new
            c_ref[:] = c_new
            y_ref[i] = jnp.where(valid, h2, 0.0)
            cs_ref[i] = c_new
            return 0

        jax.lax.fori_loop(0, C, step, 0)

    return kernel


_lstm_fwd_kernel = _make_fwd_kernel(False)


def _make_bwd_kernel(reverse: bool, whh_stream: bool = False):
    """Adjoint of the time loop over one CHUNK; the (dh, dc) carries live in
    VMEM.  Residuals stream UNPACKED — y, cs, dy blocks plus one-row
    boundary sidecars (yb/csb hold the adjacent chunk's edge state) — so the
    caller never materializes the round-2 ``[T, B, 4H]`` concat nor the
    shifted copies (~500 MB of pure layout traffic per flagship step).
    h_prev/c_prev are the PROCESSING predecessors: within the chunk they are
    the neighboring row of y/cs; at the chunk edge they come from the
    sidecar; at the sequence edge they are the zero initial state.  The walk
    order mirrors the forward: newest-first normally, oldest-first for
    ``reverse=True``.  dWhh is NOT accumulated here: the streamed dgates
    make it one big batched matmul outside (sum_t h_prev_t^T dgates_t)."""

    def kernel(len_ref, gx_ref, y_ref, cs_ref, dy_ref, yb_ref, csb_ref,
               whh_ref, dgx_ref, dh_ref, dc_ref, *rest):
        k = pl.program_id(0)
        Tc = pl.num_programs(0)
        C = gx_ref.shape[0]

        @pl.when(k == 0)
        def _():
            dh_ref[:] = jnp.zeros_like(dh_ref)
            dc_ref[:] = jnp.zeros_like(dc_ref)

        if whh_stream:
            whh_vmem, sem = rest
            _load_whh(k, whh_ref, whh_vmem, sem)
            whh_ref = whh_vmem

        def step(j, _):
            if reverse:
                i = j  # reversed direction: adjoint walks oldest-first
                kg = k  # true chunk index
                t = k * C + i
                # processing predecessor is t+1: row i+1, or the NEXT
                # chunk's first row (sidecar), or zero at the end
                in_chunk = i < C - 1
                at_edge = kg == Tc - 1
                nb = jnp.minimum(i + 1, C - 1)
            else:
                i = C - 1 - j  # walk the chunk backwards
                kg = Tc - 1 - k
                t = kg * C + i
                # predecessor is t-1: row i-1, the PREVIOUS chunk's last
                # row (sidecar), or zero at the start
                in_chunk = i > 0
                at_edge = kg == 0
                nb = jnp.maximum(i - 1, 0)
            H = dh_ref.shape[-1]
            h_nb = y_ref[nb]
            c_nb = cs_ref[nb]
            h_prev = jnp.where(in_chunk, h_nb,
                               jnp.where(at_edge, 0.0, yb_ref[0]))
            c_prev = jnp.where(in_chunk, c_nb,
                               jnp.where(at_edge, 0.0, csb_ref[0]))
            c_t = cs_ref[i]
            dy = dy_ref[i]
            # recompute the forward gates from streamed residuals
            gates = gx_ref[i].astype(jnp.float32) + jnp.dot(
                h_prev.astype(whh_ref.dtype), whh_ref[:],
                preferred_element_type=jnp.float32,
            )
            ii = jax.nn.sigmoid(gates[:, :H])
            f = jax.nn.sigmoid(gates[:, H : 2 * H])
            g = jnp.tanh(gates[:, 2 * H : 3 * H])
            o = jax.nn.sigmoid(gates[:, 3 * H :])
            tanh_c = jnp.tanh(c_t)

            dh_in = dh_ref[:]
            dh = dh_in + dy  # dy only contributes where the step was valid
            dc = dc_ref[:]
            do = dh * tanh_c
            dct = dh * o * (1.0 - tanh_c * tanh_c) + dc
            di = dct * g
            dg = dct * ii
            df = dct * c_prev
            dc_prev = dct * f
            dgates = jnp.concatenate(
                [
                    di * ii * (1.0 - ii),
                    df * f * (1.0 - f),
                    dg * (1.0 - g * g),
                    do * o * (1.0 - o),
                ],
                axis=-1,
            )  # [B, 4H]
            valid = (t < len_ref[:, 0])[:, None]
            dgates = jnp.where(valid, dgates, 0.0)
            # dh_{t-1} = dgates @ Whh^T  (contract the 4H axis)
            dh_prev = jax.lax.dot_general(
                dgates.astype(whh_ref.dtype), whh_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dh_ref[:] = jnp.where(valid, dh_prev, dh_in)
            dc_ref[:] = jnp.where(valid, dc_prev, dc)
            dgx_ref[i] = dgates
            return 0

        jax.lax.fori_loop(0, C, step, 0)

    return kernel


_lstm_bwd_kernel = _make_bwd_kernel(False)


#: MXU input dtype for the kernels: "float32" (default) or "bfloat16"
#: (halved stream bytes + faster MXU pass; accumulation stays f32).
KERNEL_DTYPE = "float32"

#: At H >= this width the VMEM-resident ``W_hh`` block is held in bf16
#: regardless of KERNEL_DTYPE (the [H, 4H] f32 weight alone is 9.4 MB at
#: H=768 / 16.8 MB at H=1024 — past the 16 MB scoped-VMEM budget once the
#: double-buffered streams are added).  Streams and carries stay f32, and
#: the recurrent matmul accumulates in f32, so this matches XLA's DEFAULT
#: matmul precision on TPU (single-pass bf16 inputs, f32 accumulation) —
#: it is not a numerics downgrade relative to the lax.scan path.
WEIGHT_BF16_MIN_H = 768


def _kdt():
    import jax.numpy as _jnp

    return _jnp.bfloat16 if KERNEL_DTYPE == "bfloat16" else _jnp.float32


def _wdt(H: int):
    if KERNEL_DTYPE == "bfloat16" or H >= WEIGHT_BF16_MIN_H:
        return jnp.bfloat16
    return jnp.float32


def _chunk_for(B: int, H: int = 256) -> int:
    """DMA block length, shrunk so the backward kernel's VMEM footprint —
    the resident [H, 4H] weight block plus the double-buffered in/out
    streams ([C, B, 4H] gx + f32 dgx + three [C, B, H] f32 residual
    streams) — stays inside a ~14 MB scoped-VMEM budget (16 MB minus
    slack for carries/sidecars).  B=128 with CHUNK=8 blocks needs >20 MB
    and fails compilation (docs/PROFILE_OPT.json); wide recurrences eat
    the budget from the weight side instead (H=1024: 8.4 MB of bf16
    W_hh), landing at C=2 for H >= 768 (on-chip-verified; C=4 under the
    raised limit A/B'd noise-level, docs/PERF.md)."""
    if H <= 512:
        # legacy rule, exactly the on-chip-verified shapes (H <= 512):
        # B=32/64 keep CHUNK=8, B=96/128 halve to 4, B=256 to 2
        c = CHUNK
        while c > 2 and B * c > 512:
            c //= 2
        return c
    # Empirically derated budget: the compiler's scoped accounting exceeds
    # the naive two-buffer model by ~4.5 MB (it charged 17.84 MB where the
    # model says 13.3 MB, H=768 C=4), so size against ~11.5 MB.  On-chip:
    # H=768 C=2 compiles at the STOCK 16 MB limit; H=1024 lands at the C=2
    # floor and additionally needs rnn.wide_h_compiler_options (the
    # trainers attach it automatically past H=512).
    budget = 11.5 * 2**20
    whh_bytes = H * 4 * H * (2 if _wdt(H) == jnp.bfloat16 else 4)
    sx = 2 if _kdt() == jnp.bfloat16 else 4
    # per-chunk-step stream bytes, double-buffered: gx in (4H*sx) +
    # dgx out f32 (4H*4) + y/cs/dy residuals f32 (3H*4)
    per_c = B * H * (4 * sx + 16 + 12) * 2
    c = CHUNK
    while c > 2 and whh_bytes + c * per_c > budget:
        c //= 2
    return c


def _pad_time(a, Tp):
    T = a.shape[0]
    if T == Tp:
        return a
    return jnp.concatenate(
        [a, jnp.zeros((Tp - T,) + a.shape[1:], a.dtype)], axis=0
    )


# ---------------------------------------------------------------------------
# GSPMD partitioning: under jit + auto sharding (jax.set_mesh) the kernels
# declare themselves batch-parallel via custom_partitioning, so multi-chip
# data-parallel jit keeps the fused kernels instead of falling back to scan.
# The time axis stays unsharded (the recurrence is sequential); weights are
# replicated. shard_map paths never reach this (mesh axes are Manual there).
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=16)
def _cp_fwd(interpret: bool, reverse: bool = False, chunk=None):
    from ss_asr_tpu.ops.pallas.partition import batch_partitioned

    return batch_partitioned(
        functools.partial(_fwd_core, interpret=interpret, reverse=reverse,
                          chunk=chunk),
        in_batch_dims=[0, 1, None],
        out_batch_dims=[1, 1],
        rule="b u, t b g, h g -> t b h1, t b h1",
    )


@functools.lru_cache(maxsize=16)
def _cp_bwd(interpret: bool, reverse: bool = False, chunk=None):
    from ss_asr_tpu.ops.pallas.partition import batch_partitioned

    def bwd(lengths2d, gates_x, y, cs, dy, yb, csb, whh):
        # 1-tuple: batch_partitioned infers shardings per output entry
        return (_bwd_core(lengths2d, gates_x, y, cs, dy, yb, csb, whh,
                          interpret, reverse, chunk),)

    return batch_partitioned(
        bwd,
        in_batch_dims=[0, 1, 1, 1, 1, 1, 1, None],
        out_batch_dims=[1],
        rule="b u, t b g, t b h1, t b h1, t b h1, c b h1, c b h1, h g -> t b g",
    )


def _fwd_core(lengths2d, gates_x, whh, interpret, reverse=False, chunk=None):
    """The raw forward pallas_call; shapes read from the (possibly local,
    under custom_partitioning) operands. gates_x must be chunk-padded.
    ``reverse``: stream chunks newest-first (backward BiLSTM direction)."""
    CH = chunk or CHUNK
    Tp, B, G = gates_x.shape
    H = G // 4
    Tc = Tp // CH
    if reverse:
        tmap = lambda k: (Tc - 1 - k, 0, 0)  # noqa: E731
    else:
        tmap = lambda k: (k, 0, 0)  # noqa: E731
    whh_stream = H >= WEIGHT_BF16_MIN_H
    scratch = [
        pltpu.VMEM((B, H), jnp.float32),
        pltpu.VMEM((B, H), jnp.float32),
    ]
    if whh_stream:
        whh_spec = _whh_any_spec()
        scratch += [pltpu.VMEM((H, G), whh.dtype), pltpu.SemaphoreType.DMA]
    else:
        whh_spec = pl.BlockSpec((H, G), lambda k: (0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(Tc,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda k: (0, 0)),
            pl.BlockSpec((CH, B, G), tmap),
            whh_spec,
        ],
        out_specs=[
            pl.BlockSpec((CH, B, H), tmap),
            pl.BlockSpec((CH, B, H), tmap),
        ],
        scratch_shapes=scratch,
    )
    return pl.pallas_call(
        _make_fwd_kernel(reverse, whh_stream),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Tp, B, H), jnp.float32),
            jax.ShapeDtypeStruct((Tp, B, H), jnp.float32),
        ],
        interpret=interpret,
    )(lengths2d, gates_x, whh)


def _fwd_pallas(gates_x, whh, lengths, interpret, reverse=False):
    gates_x = gates_x.astype(_kdt())
    T, B, G = gates_x.shape
    H = G // 4
    whh = whh.astype(_wdt(H))
    c = _chunk_for(B, H)
    Tp = ((T + c - 1) // c) * c
    gates_x = _pad_time(gates_x, Tp)  # padded steps are masked by lengths
    lengths2d = lengths.astype(jnp.int32).reshape(B, 1)
    from ss_asr_tpu.ops import rnn as _rnn

    if _rnn._gspmd_axes_live():
        y, cs = _cp_fwd(interpret, reverse, c)(lengths2d, gates_x, whh)
    else:
        y, cs = _fwd_core(lengths2d, gates_x, whh, interpret, reverse, c)
    return y[:T], cs[:T]


def _bwd_core(lengths2d, gates_x, y, cs, dy, yb, csb, whh, interpret,
              reverse=False, chunk=None):
    """The raw backward pallas_call; time arrays must be CHUNK-padded.
    The adjoint walks opposite to the forward direction: newest chunk first
    normally, OLDEST first for the reversed direction.  ``yb``/``csb`` are
    [Tc, B, H] chunk-boundary sidecars: for the forward direction row j is
    y/cs at the LAST step of chunk j (the predecessor of chunk j+1's first
    step); for the reversed direction row j is y/cs at the FIRST step of
    chunk j (the predecessor of chunk j-1's last step)."""
    CH = chunk or CHUNK
    Tp, B, G = gates_x.shape
    H = G // 4
    Tc = Tp // CH
    if reverse:
        tmap = lambda k: (k, 0, 0)  # noqa: E731 — oldest chunk first
        # predecessor chunk is k+1 (clamped; the at-edge branch masks it)
        bmap = lambda k: (jnp.minimum(k + 1, Tc - 1), 0, 0)  # noqa: E731
    else:
        tmap = lambda k: (Tc - 1 - k, 0, 0)  # noqa: E731 — newest first
        # predecessor chunk is (Tc-1-k)-1 (clamped)
        bmap = lambda k: (jnp.maximum(Tc - 2 - k, 0), 0, 0)  # noqa: E731
    whh_stream = H >= WEIGHT_BF16_MIN_H
    scratch = [
        pltpu.VMEM((B, H), jnp.float32),
        pltpu.VMEM((B, H), jnp.float32),
    ]
    if whh_stream:
        whh_spec = _whh_any_spec()
        scratch += [pltpu.VMEM((H, G), whh.dtype), pltpu.SemaphoreType.DMA]
    else:
        whh_spec = pl.BlockSpec((H, G), lambda k: (0, 0))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(Tc,),
        in_specs=[
            pl.BlockSpec((B, 1), lambda k: (0, 0)),
            pl.BlockSpec((CH, B, G), tmap),
            pl.BlockSpec((CH, B, H), tmap),
            pl.BlockSpec((CH, B, H), tmap),
            pl.BlockSpec((CH, B, H), tmap),
            pl.BlockSpec((1, B, H), bmap),
            pl.BlockSpec((1, B, H), bmap),
            whh_spec,
        ],
        out_specs=[
            pl.BlockSpec((CH, B, G), tmap),
        ],
        scratch_shapes=scratch,
    )
    (dgx,) = pl.pallas_call(
        _make_bwd_kernel(reverse, whh_stream),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Tp, B, G), jnp.float32),
        ],
        interpret=interpret,
    )(lengths2d, gates_x, y, cs, dy, yb, csb, whh)
    return dgx


def _bwd_pallas(gates_x, whh, lengths, y, cs, dy, interpret, reverse=False):
    gates_x = gates_x.astype(_kdt())
    T, B, G = gates_x.shape
    H = G // 4
    whh = whh.astype(_wdt(H))
    c = _chunk_for(B, H)
    Tp = ((T + c - 1) // c) * c
    lengths2d = lengths.astype(jnp.int32).reshape(B, 1)
    # residual pack [T, B, 4H] = [h_prev | c_prev | c_t | dy]  (one stream).
    # h_prev/c_prev are the PROCESSING predecessors: t-1 for the forward
    # direction, t+1 for the reversed direction.
    gates_x = _pad_time(gates_x, Tp)
    y_p = _pad_time(y, Tp)
    cs_p = _pad_time(cs, Tp)
    dy_p = _pad_time(dy.astype(jnp.float32), Tp)
    # one-row-per-chunk boundary sidecars (strided slices, ~y_bytes/CHUNK):
    # forward dir needs each chunk's LAST step, reversed its FIRST
    if reverse:
        yb, csb = y_p[0::c], cs_p[0::c]
    else:
        yb, csb = y_p[c - 1 :: c], cs_p[c - 1 :: c]
    from ss_asr_tpu.ops import rnn as _rnn

    if _rnn._gspmd_axes_live():
        (dgx,) = _cp_bwd(interpret, reverse, c)(
            lengths2d, gates_x, y_p, cs_p, dy_p, yb, csb, whh
        )
    else:
        dgx = _bwd_core(
            lengths2d, gates_x, y_p, cs_p, dy_p, yb, csb, whh, interpret,
            reverse, c
        )
    dgx = dgx[:T]
    # dWhh = sum_t h_prev_t^T dgates_t as ONE batched MXU matmul over SLICED
    # views of y (the t where h_prev is the zero initial state contributes
    # nothing). GSPMD all-reduces the batch contraction when dgx is
    # batch-sharded.
    if reverse:
        dwhh = jnp.einsum("tbh,tbg->hg", y[1:], dgx[: T - 1])
    else:
        dwhh = jnp.einsum("tbh,tbg->hg", y[: T - 1], dgx[1:])
    return dgx, dwhh


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def lstm_seq_pallas_vjp(gates_x, whh, lengths, reverse=False, interpret=False):
    """Differentiable fused LSTM loop: both directions of the time loop run
    as Pallas kernels with VMEM-resident carries and dWhh accumulation.
    ``reverse=True`` is the packed backward BiLSTM direction, handled by
    kernel index mirroring (no reverse_sequence gathers)."""
    y, _ = _fwd_pallas(gates_x, whh, lengths, interpret, reverse)
    return y


def _vjp_fwd(gates_x, whh, lengths, reverse, interpret):
    y, cs = _fwd_pallas(gates_x, whh, lengths, interpret, reverse)
    return y, (gates_x, whh, lengths, y, cs)


def _vjp_bwd(reverse, interpret, res, dy):
    gates_x, whh, lengths, y, cs = res
    dgx, dwhh = _bwd_pallas(gates_x, whh, lengths, y, cs, dy, interpret, reverse)
    return dgx, dwhh, None


lstm_seq_pallas_vjp.defvjp(_vjp_fwd, _vjp_bwd)


def lstm_scan_pallas_trainable(
    p, xs: jax.Array, lengths: Optional[jax.Array] = None,
    interpret: bool = False, reverse: bool = False
) -> jax.Array:
    """Differentiable drop-in for ``rnn.lstm_scan(...)[0]`` with Pallas
    forward *and* backward kernels; the input/weight projections stay in XLA
    (their grads are plain matmuls). ``reverse=True`` runs the packed
    backward direction natively (== reverse_sequence(scan(reverse_sequence))
    but without the four HBM gather round trips)."""
    B, T, _ = xs.shape
    if lengths is None:
        lengths = jnp.full((B,), T, dtype=jnp.int32)
    # time-major gates straight out of the projection (einsum output layout)
    # instead of matmul + swapaxes — lets XLA emit [T, B, 4H] directly
    gx = jnp.einsum("btf,fg->tbg", xs, p["w_ih"]) + p["b"]
    y = lstm_seq_pallas_vjp(gx, p["w_hh"], lengths, reverse, interpret)
    return jnp.swapaxes(y, 0, 1)


def lstm_scan_pallas(
    p,
    xs: jax.Array,
    lengths: Optional[jax.Array] = None,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in (forward-only) equivalent of ``rnn.lstm_scan(...)[0]``.

    xs: [B, T, in] -> [B, T, H].  The input projection runs as one big MXU
    matmul in XLA; only the sequential part enters the kernel.
    """
    B, T, _ = xs.shape
    if lengths is None:
        lengths = jnp.full((B,), T, dtype=jnp.int32)
    gx = xs @ p["w_ih"] + p["b"]  # [B, T, 4H]
    gx = jnp.swapaxes(gx, 0, 1)  # [T, B, 4H]
    y = lstm_seq_pallas(gx, p["w_hh"], lengths, interpret=interpret)
    return jnp.swapaxes(y, 0, 1)
