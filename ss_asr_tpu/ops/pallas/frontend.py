"""Fused Pallas frontend kernel: frame + window + DFT + power + mel + log.

The north-star e2e benchmark names "a fused Pallas STFT+mel-filterbank+log
kernel" (BASELINE.json). This module is that kernel, built and measured
on-chip — and the measurement (docs/PROFILE_FRONTEND.json fused_kernel_ab)
is a TIE with the XLA matmul pipeline (marginal 0.500 vs 0.494 ms/batch;
e2e 5743 vs 5717 utt/s, inside the run-to-run band), so the XLA path
stays the default (``ops.frontend.FRONTEND_IMPL``) and the kernel is
opt-in. Why the fusion doesn't win, for the record:

* The XLA path streams ~130 MB of intermediates per B=32/T=512 batch
  (frames 26 MB w+r, spectrum 26 MB w+r, power 13 MB w+r) ≈ 0.16 ms at
  v5e HBM bandwidth. Keeping the pipeline VMEM-resident recovers that —
  but Mosaic cannot lane-concat sublane-shifted slices of one buffer
  ("offset mismatch on non-concat dimension", also unchanged by
  ``pltpu.roll``), so in-kernel zero-copy frame assembly is off the
  table. Three formulations were measured:
  1. slab-decomposed DFT (k shifted [nfb, hop] x [hop, 2nb] dots, no
     frame matrix): +50% K-tile padding over the single [nfb, k*hop]
     dot -> 0.630 ms, LOSES to XLA's 0.494;
  2. k hop-pre-shifted signal views materialized by XLA and lane-concat
     of offset-0 loads in-kernel (this module): the 3x signal copies
     (+60 MB) cancel the fusion savings -> 0.500 ms, tie;
  3. dynamic-start loads from one buffer (zero-copy): Mosaic compile
     hangs.
* The DFT itself is already MXU-shaped in both paths; fusing cannot
  reduce its passes, only the layout traffic — and that traffic is the
  same order as the copies the layout constraints force back in.

Kernel design (reference semantics: src/preprocess.py:187-208 via
ops/frontend.py's librosa-0.6 parity pipeline): grid
``(B, ceil(nf/NF_BLOCK))``; per cell, frame ``t`` is the lane-concat of
hop-blocks ``t..t+k-1`` taken from k hop-pre-shifted ``[B, rows, hop]``
views; the windowed DFT basis is zero-padded to ``[k*hop, 2*n_bins]`` so
the ragged frame tail contributes nothing; one MXU matmul, VPU power
(re^2+im^2), mel matmul, log. DFT_PRECISION=HIGH is emulated with the
3-pass bf16 scheme (Mosaic rejects Precision.HIGH). Forward-only:
features are model inputs, nothing differentiates through the frontend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

#: Frames per grid cell. 512 rows keeps the frame block (~1 MB at 16 kHz)
#: plus spectrum (~0.8 MB) and basis (~0.8 MB) comfortably inside VMEM
#: while covering the flagship T=512 in one cell per row. Read at trace
#: time (not part of the jit cache key): mutate + ``clear_cache()`` on
#: ``fbank_pallas`` and ``ops.frontend._log_mel_fbank_batch``, the same
#: discipline DFT_PRECISION A/Bs use (benchmarks/profile_frontend.py).
NF_BLOCK = 512


def _dot(a, b, prec):
    """f32 matmul at the requested MXU precision inside Mosaic.

    Mosaic lowers DEFAULT (1-pass bf16) and HIGHEST (6-pass) but rejects
    HIGH — emulate HIGH's 3-pass bf16 scheme by hand: split each operand
    into a bf16 hi part and a bf16-rounded residual, and sum the three
    significant cross products (hi·hi + hi·lo + lo·hi; lo·lo is below f32
    precision). This is exactly what XLA's HIGH emits on TPU."""
    dims = (((1,), (0,)), ((), ()))
    if prec != jax.lax.Precision.HIGH:
        return jax.lax.dot_general(
            a, b, dims, precision=prec, preferred_element_type=jnp.float32
        )

    def d(x, y):
        return jax.lax.dot_general(
            x, y, dims, precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32,
        )

    ah = a.astype(jnp.bfloat16).astype(jnp.float32)
    bh = b.astype(jnp.bfloat16).astype(jnp.float32)
    return d(ah, bh) + (d(ah, b - bh) + d(a - ah, bh))


def _fe_kernel(*refs, k, nfb, log_eps, prec):
    (*x_refs, wb_ref, mel_ref, out_ref) = refs
    # frame assembly: frame t is the lane-concat of hop-blocks t..t+k-1.
    # The k inputs are hop-pre-shifted views of the SAME signal (x_refs[j]
    # row r = hop-block r+j), so this cell's frames are k aligned
    # [nfb, hop] blocks at the same row offset — Mosaic cannot lane-concat
    # sublane-shifted slices of one buffer ("offset mismatch on non-concat
    # dimension"), but concat of these whole-block loads is legal, and ONE
    # full-width dot keeps the XLA path's MXU tile count (the k
    # slab-decomposed dots pay +50% K-tile padding — measured slower).
    # Each cell's BlockSpec carves its own nfb rows out of every view, so
    # multi-cell grids DMA O(nf) total, not O(nt * nf).
    frames = jnp.concatenate(
        [x_ref[0] for x_ref in x_refs], axis=1
    )  # [nfb, k*hop]
    spec = _dot(frames, wb_ref[...], prec)  # [nfb, 2*n_bins]
    n_bins = spec.shape[1] // 2
    power = spec[:, :n_bins] ** 2 + spec[:, n_bins:] ** 2
    fb = _dot(power, mel_ref[...], prec)
    out_ref[0] = jnp.log(fb + log_eps)


@functools.partial(
    jax.jit, static_argnames=("nf", "n_fft", "hop", "interpret")
)
def fbank_pallas(
    yp: jax.Array,
    wbasis: jax.Array,
    mel: jax.Array,
    nf: int,
    n_fft: int,
    hop: int,
    interpret: bool = False,
) -> jax.Array:
    """``[B, Np]`` padded signals -> ``[B, nf, n_mels]`` log-mels.

    ``yp`` must already carry the reflect padding (and any per-row
    end-reflection patches); ``wbasis`` is the window-fused DFT basis
    ``[n_fft, 2*n_bins]``; ``mel`` the ``[n_bins, n_mels]`` filterbank.
    """
    from ss_asr_tpu.ops import frontend as fe

    B = yp.shape[0]
    k = -(-n_fft // hop)  # hop-blocks per frame
    nfb = min(nf, NF_BLOCK)
    nt = -(-nf // nfb)
    # hop-rows per shifted view: cell t of view j reads rows
    # [t*nfb, (t+1)*nfb) = signal hop-blocks [t*nfb + j, (t+1)*nfb + j)
    rows = nt * nfb
    need = (rows + k - 1) * hop
    if yp.shape[1] < need:
        yp = jnp.pad(yp, ((0, 0), (0, need - yp.shape[1])))
    xs = [
        yp[:, j * hop : (j + rows) * hop].reshape(B, rows, hop)
        for j in range(k)
    ]
    # zero-pad the basis to k*hop rows: the ragged frame tail contributes 0
    wb = jnp.pad(wbasis, ((0, k * hop - n_fft), (0, 0)))
    n_mels = mel.shape[1]

    out = pl.pallas_call(
        functools.partial(
            _fe_kernel, k=k, nfb=nfb, log_eps=fe.LOG_EPS,
            prec=fe.DFT_PRECISION,
        ),
        grid=(B, nt),
        in_specs=[
            pl.BlockSpec((1, nfb, hop), lambda b, t: (b, t, 0))
            for _ in range(k)
        ] + [
            pl.BlockSpec(wb.shape, lambda b, t: (0, 0)),
            pl.BlockSpec(mel.shape, lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, nfb, n_mels), lambda b, t: (b, t, 0)),
        out_shape=jax.ShapeDtypeStruct((B, nt * nfb, n_mels), jnp.float32),
        interpret=interpret,
    )(*xs, wb, mel)
    return out[:, :nf]
