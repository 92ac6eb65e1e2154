"""Log-mel filterbank frontend as a jitted JAX pipeline.

TPU-native replacement for the reference's offline librosa pass
(reference: src/preprocess.py:187-208): 40-band mel spectrogram with a 25 ms
Hann window and 10 ms stride, natural ``log(x + float64_eps)``, output shaped
``[num_frames, n_mels]``.

Design notes (TPU-first):

* The DFT is expressed as a single real matmul ``frames @ dft_basis`` with a
  precomputed ``[n_fft, 2 * n_bins]`` cos/sin basis — this runs on the MXU with
  static shapes, avoids XLA's FFT path for awkward odd sizes (e.g. n_fft=551
  at 22.05 kHz), fuses with the window multiply, and is trivially
  differentiable.
* Mel projection is a second matmul; power + log are fused elementwise by XLA.
* Everything is shape-static: callers pass fixed-size (bucketed) signal
  buffers plus true sample counts; frame validity is derived from lengths.

Semantics parity with librosa 0.6 ``melspectrogram``:

* STFT ``center=True`` with reflect padding, periodic Hann window of length
  ``n_fft``, ``power=2.0``.
* Slaney-style mel filters (``htk=False``), area-normalized (``norm=1``),
  ``fmin=0``, ``fmax=sr/2``.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

N_DIMS = 40  # mel bands (reference: src/preprocess.py:30)
WIN_MS = 25  # window length in ms (src/preprocess.py:31)
STRIDE_MS = 10  # hop in ms (src/preprocess.py:32)
#: log floor — float64 machine eps, as in the reference's np.finfo(float).eps
LOG_EPS = float(np.finfo(np.float64).eps)


def _hz_to_mel(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa htk=False)."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mels = np.where(log_region, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)
    return mels



#: MXU precision for the DFT/mel projection matmuls. HIGH (3-pass bf16
#: emulation) is the default: measured within 2e-4 of HIGHEST in the
#: log-feature domain (docs/PROFILE_FRONTEND.json — 40x under the golden
#: test tolerance) at ~2/3 the matmul cost. Single-pass DEFAULT distorts
#: log features by ~0.05 and stays excluded; HIGHEST remains available for
#: bit-conservative runs.
DFT_PRECISION = jax.lax.Precision.HIGH

def _mel_to_hz(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = m >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


def mel_filterbank(
    sr: int, n_fft: int, n_mels: int = N_DIMS, fmin: float = 0.0, fmax: float | None = None
) -> np.ndarray:
    """Slaney-style area-normalized mel filter matrix ``[n_bins, n_mels]``."""
    if fmax is None:
        fmax = sr / 2.0
    n_bins = 1 + n_fft // 2
    fftfreqs = np.linspace(0.0, sr / 2.0, n_bins)
    mel_pts = _mel_to_hz(np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts.reshape(-1, 1) - fftfreqs.reshape(1, -1)
    lower = -ramps[:-2] / fdiff[:-1].reshape(-1, 1)
    upper = ramps[2:] / fdiff[1:].reshape(-1, 1)
    weights = np.maximum(0.0, np.minimum(lower, upper))
    # Slaney area normalization (librosa norm=1)
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm.reshape(-1, 1)
    return weights.T.astype(np.float32)  # [n_bins, n_mels]


def _hann_periodic(n: int) -> np.ndarray:
    """Periodic Hann window (scipy get_window('hann', n, fftbins=True))."""
    return (0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n) / n)).astype(np.float32)


@functools.lru_cache(maxsize=8)
def _dft_basis(n_fft: int) -> np.ndarray:
    """Real-DFT basis ``[n_fft, 2 * n_bins]`` = [cos | -sin] columns."""
    n_bins = 1 + n_fft // 2
    t = np.arange(n_fft).reshape(-1, 1)
    k = np.arange(n_bins).reshape(1, -1)
    ang = 2.0 * np.pi * t * k / n_fft
    basis = np.concatenate([np.cos(ang), -np.sin(ang)], axis=1)
    return basis.astype(np.float32)


def frame_params(sr: int, win_ms: int = WIN_MS, stride_ms: int = STRIDE_MS) -> Tuple[int, int]:
    """(n_fft, hop) in samples for a sample rate — int truncation as reference."""
    return int(sr * 0.001 * win_ms), int(sr * 0.001 * stride_ms)


def num_frames(n_samples, n_fft: int, hop: int):
    """Frame count for a centered STFT: 1 + floor(n_samples / hop) semantics.

    With center=True, the padded signal has ``n + 2*(n_fft//2)`` samples and
    the frame count is ``1 + (n + 2*(n_fft//2) - n_fft) // hop``.
    Works on ints or arrays.
    """
    return 1 + (n_samples + 2 * (n_fft // 2) - n_fft) // hop


def _frame_indices(n_frames: int, n_fft: int, hop: int) -> np.ndarray:
    starts = np.arange(n_frames) * hop
    return starts.reshape(-1, 1) + np.arange(n_fft).reshape(1, -1)


@functools.partial(jax.jit, static_argnames=("sr", "n_mels", "win_ms", "stride_ms"))
def log_mel_fbank(
    y: jax.Array,
    sr: int,
    n_mels: int = N_DIMS,
    win_ms: int = WIN_MS,
    stride_ms: int = STRIDE_MS,
) -> jax.Array:
    """``[n_samples] -> [num_frames, n_mels]`` log-mel filterbank (jitted).

    The full pipeline — reflect pad, frame, window, DFT-matmul, power, mel
    matmul, log — compiles to two MXU matmuls plus fused elementwise ops.
    """
    n_fft, hop = frame_params(sr, win_ms, stride_ms)
    n = y.shape[0]
    pad = n_fft // 2
    y = jnp.pad(y.astype(jnp.float32), (pad, pad), mode="reflect")
    nf = int(num_frames(n, n_fft, hop))
    idx = jnp.asarray(_frame_indices(nf, n_fft, hop))
    frames = y[idx]  # [nf, n_fft]
    window = jnp.asarray(_hann_periodic(n_fft))
    basis = jnp.asarray(_dft_basis(n_fft))  # [n_fft, 2*n_bins]
    # DFT_PRECISION (default HIGH, 3-pass): the DFT/mel projections feed
    # log-domain features, so SINGLE-pass bf16 visibly distorts them; the
    # 3-pass emulation is within 2e-4 of 6-pass (docs/PROFILE_FRONTEND.json)
    spec = jnp.dot(frames * window, basis, precision=DFT_PRECISION)
    n_bins = 1 + n_fft // 2
    power = spec[:, :n_bins] ** 2 + spec[:, n_bins:] ** 2
    mel = jnp.asarray(mel_filterbank(sr, n_fft, n_mels))
    fb = jnp.dot(power, mel, precision=DFT_PRECISION)
    return jnp.log(fb + LOG_EPS)


@functools.lru_cache(maxsize=8)
def _windowed_dft_basis(n_fft: int) -> np.ndarray:
    """Window·DFT fused into one ``[n_fft, 2*n_bins]`` projection matrix."""
    window = _hann_periodic(n_fft)  # [n_fft]
    basis = _dft_basis(n_fft)  # [n_fft, 2*n_bins]
    return (window[:, None] * basis).astype(np.float32)


def _frame_by_slices(yp: jax.Array, nf: int, n_fft: int, hop: int) -> jax.Array:
    """Overlapping frames via k hop-strided slices — NO gather, NO conv.

    ``frames[t] = yp[t*hop : t*hop + n_fft]``. Each slice
    ``yp[:, j*hop : j*hop + nf*hop]`` reshaped to ``[B, nf, hop]`` contributes
    the j-th hop-block of every frame; concatenating k = ceil(n_fft/hop)
    slices gives ``[B, nf, k*hop]`` whose first ``n_fft`` columns are exactly
    the frames. Slices + reshapes lower to cheap linear copies on TPU —
    measured faster than both the index-gather and the strided-conv
    formulations of the same framing (docs/PERF.md round 2).
    """
    B = yp.shape[0]
    k = -(-n_fft // hop)  # ceil
    need = (nf + k - 1) * hop
    if yp.shape[1] < need:
        yp = jnp.pad(yp, ((0, 0), (0, need - yp.shape[1])))
    blocks = [
        yp[:, j * hop : (j + nf) * hop].reshape(B, nf, hop) for j in range(k)
    ]
    return jnp.concatenate(blocks, axis=-1)[..., :n_fft]  # [B, nf, n_fft]


#: Batched-frontend implementation. "pallas" opts into the fused Pallas
#: kernel (ops/pallas/frontend.py — the north-star fused
#: STFT+mel+log kernel); measured a TIE with this XLA matmul pipeline on
#: v5e (marginal 0.500 vs 0.494 ms/batch, e2e inside the run-to-run band;
#: docs/PROFILE_FRONTEND.json fused_kernel_ab and the kernel module's
#: docstring for why), so "auto" resolves to the XLA path. Settable as
#: the module global or the FRONTEND_IMPL environment variable (the env
#: var wins; checked per call, so it also works after import).
FRONTEND_IMPL = "auto"


def _use_pallas_frontend() -> bool:
    return os.environ.get("FRONTEND_IMPL", FRONTEND_IMPL) == "pallas"


def log_mel_fbank_batch(
    y: jax.Array,
    n_samples: jax.Array,
    sr: int,
    n_mels: int = N_DIMS,
    win_ms: int = WIN_MS,
    stride_ms: int = STRIDE_MS,
) -> Tuple[jax.Array, jax.Array]:
    """Batched frontend over fixed-size signal buffers.

    Args:
      y: ``[B, N]`` zero-padded signals (static N — bucket upstream).
      n_samples: ``[B]`` true sample counts, or ``None`` when every row
        fills the buffer — skips the per-row end-reflection patch and the
        frame masking (both identities at full length).

    Returns ``(fbanks [B, T, n_mels], frame_lens [B])`` where ``T`` is the
    frame count for the full buffer and frames past ``frame_lens[b]`` are
    zeroed (so downstream can recover lengths, as the reference's global
    zero-padding contract does — src/ASRDataset.py:311-317).

    Implementation: buffer-level reflect pad (cheap), then each row's
    end-reflection window is patched so the reflection happens at that row's
    OWN true end ``n_samples[b]`` instead of the zero-padded buffer edge —
    every valid frame is numerically identical to running ``log_mel_fbank``
    on the row's true-length signal. The patch is a [B, pad] gather + a
    vmapped ``dynamic_update_slice`` (O(B·pad), not a full-width gather —
    a per-row take_along_axis over the whole buffer measured 10x slower
    than ``jnp.pad`` on v5e). Framing is slice-based (``_frame_by_slices``),
    then ONE fused window·DFT matmul and the mel matmul — both MXU; on TPU
    the frame/DFT/power/mel/log pipeline instead runs as ONE fused Pallas
    kernel (``FRONTEND_IMPL``, ops/pallas/frontend.py) that keeps every
    intermediate VMEM-resident.
    """
    impl = "pallas" if _use_pallas_frontend() else "xla"
    interpret = impl == "pallas" and jax.default_backend() != "tpu"
    return _log_mel_fbank_batch(
        y, n_samples, sr, n_mels, win_ms, stride_ms, impl, interpret
    )


def log_mel_fbank_ragged(sigs, sr, n_mels=N_DIMS, min_rows=1):
    """Frontend over a ragged list of signals, compile-cache friendly.

    Pads the signals into one ``[max(len(sigs), min_rows), bucket]`` buffer
    on a half-second bucket grid (padded rows carry 1 sample, their output
    is discarded) so repeated calls hit at most one cached executable per
    (bucket, rows) shape — the shared shape discipline of the transcribe
    and pseudolabel CLIs.  Returns a list of ``[T_i, n_mels]`` float32
    arrays, one per input signal.
    """
    import numpy as np

    if not sigs:
        return []
    step = max(sr // 2, 1)
    bucket = -(-max(len(s) for s in sigs) // step) * step
    nrows = max(len(sigs), min_rows)
    buf = np.zeros((nrows, bucket), np.float32)
    ns = np.zeros((nrows,), np.int32)
    for r, s in enumerate(sigs):
        buf[r, : len(s)] = s
        ns[r] = len(s)
    ns[len(sigs):] = 1  # padded rows: 1 sample, output discarded
    fb, fl = log_mel_fbank_batch(buf, ns, sr, n_mels=n_mels)
    fb, fl = np.asarray(fb), np.asarray(fl)
    return [fb[r, : fl[r]] for r in range(len(sigs))]


@functools.partial(
    jax.jit,
    static_argnames=("sr", "n_mels", "win_ms", "stride_ms", "impl",
                     "interpret"),
)
def _log_mel_fbank_batch(
    y, n_samples, sr, n_mels, win_ms, stride_ms, impl="xla", interpret=False
):
    n_fft, hop = frame_params(sr, win_ms, stride_ms)
    pad = n_fft // 2
    y = y.astype(jnp.float32)
    yp = jnp.pad(y, ((0, 0), (pad, pad)), mode="reflect")
    if n_samples is not None:
        ns = jnp.maximum(n_samples.astype(jnp.int32), 1)[:, None]

        def tri(sidx):
            # numpy/jnp 'reflect' index map for arbitrary |coords| (period
            # 2(ns-1) triangle) — multi-bounces exactly like jnp.pad does
            # for signals shorter than the pad width
            period = jnp.maximum(2 * ns - 2, 1)
            m = jnp.mod(sidx, period)
            return jnp.clip(jnp.where(m < ns, m, period - m), 0, ns - 1)

        # START: the buffer-level reflect read y[pad-j], which runs past the
        # true end for rows shorter than pad samples — rewrite it per row
        start = jnp.take_along_axis(y, tri(jnp.arange(pad, 0, -1)[None, :]), axis=1)
        yp = yp.at[:, :pad].set(start)
        # END: valid frames only ever read signal coords s < ns + pad;
        # coords s in [ns, ns+pad) must read the row's own end reflection
        patch = jnp.take_along_axis(y, tri(ns + jnp.arange(pad)[None, :]), axis=1)
        yp = jax.vmap(
            lambda row, p, n: jax.lax.dynamic_update_slice(row, p, (n + pad,))
        )(yp, patch, ns[:, 0])
    nf = int(num_frames(y.shape[1], n_fft, hop))
    wbasis = jnp.asarray(_windowed_dft_basis(n_fft))  # [n_fft, 2*n_bins]
    mel = jnp.asarray(mel_filterbank(sr, n_fft, n_mels))  # [n_bins, n_mels]
    if impl == "pallas":
        from ss_asr_tpu.ops.pallas.frontend import fbank_pallas

        fb = fbank_pallas(yp, wbasis, mel, nf, n_fft, hop,
                          interpret=interpret)
    else:
        frames = _frame_by_slices(yp, nf, n_fft, hop)  # [B, nf, n_fft]
        spec = jnp.dot(frames, wbasis, precision=DFT_PRECISION)
        n_bins = 1 + n_fft // 2
        power = spec[..., :n_bins] ** 2 + spec[..., n_bins:] ** 2
        fb = jnp.dot(power, mel, precision=DFT_PRECISION)
        fb = jnp.log(fb + LOG_EPS)
    if n_samples is None:
        return fb, jnp.full((y.shape[0],), nf, dtype=jnp.int32)
    frame_lens = num_frames(n_samples, n_fft, hop).astype(jnp.int32)
    mask = jnp.arange(nf)[None, :] < frame_lens[:, None]
    fb = jnp.where(mask[:, :, None], fb, 0.0)
    return fb, frame_lens


def compute_fbank(y: np.ndarray, sr: int, n_mels: int = N_DIMS) -> np.ndarray:
    """Host convenience: one signal -> ``[T, n_mels]`` float32 numpy array."""
    return np.asarray(log_mel_fbank(jnp.asarray(y, dtype=jnp.float32), sr, n_mels), dtype=np.float32)


@functools.partial(jax.jit, static_argnames=("sr", "n_mels", "win_ms", "stride_ms"))
def _fbank_frames_raw(
    buf: jax.Array, sr: int, n_mels: int, win_ms: int, stride_ms: int
) -> jax.Array:
    """Frames for an already-padded buffer: every full window position."""
    n_fft, hop = frame_params(sr, win_ms, stride_ms)
    nf = (buf.shape[0] - n_fft) // hop + 1
    frames = _frame_by_slices(buf[None, :], nf, n_fft, hop)[0]
    wbasis = jnp.asarray(_windowed_dft_basis(n_fft))
    spec = jnp.dot(frames, wbasis, precision=DFT_PRECISION)
    n_bins = 1 + n_fft // 2
    power = spec[..., :n_bins] ** 2 + spec[..., n_bins:] ** 2
    mel = jnp.asarray(mel_filterbank(sr, n_fft, n_mels))
    return jnp.log(jnp.dot(power, mel, precision=DFT_PRECISION) + LOG_EPS)


class StreamingFrontend:
    """Chunked long-form frontend: push samples, get frames incrementally.

    Emits frames numerically identical to ``log_mel_fbank`` on the
    concatenated signal (tests/test_frontend.py): ``center=True``'s
    start/end reflect-padding is synthesized once enough samples arrive /
    at ``close()``, and overlap context (``n_fft - hop`` samples) carries
    across chunks. Device shapes are fixed: samples are processed in
    ``block``-sized windows, so XLA compiles exactly one program regardless
    of stream length — the long-form answer for a frontend whose batched
    form requires static utterance buckets.

        fe = StreamingFrontend(sr=16000)
        for chunk in audio_chunks:
            frames.append(fe.push(chunk))
        frames.append(fe.close())
    """

    def __init__(self, sr: int, n_mels: int = N_DIMS, win_ms: int = WIN_MS,
                 stride_ms: int = STRIDE_MS, block: int = 16000):
        self.sr, self.n_mels = sr, n_mels
        self.win_ms, self.stride_ms = win_ms, stride_ms
        self.n_fft, self.hop = frame_params(sr, win_ms, stride_ms)
        self.pad = self.n_fft // 2
        self.block = max(block, 2 * self.n_fft)
        self._pre = np.zeros((0,), np.float32)  # samples before left pad done
        self._buf: Optional[np.ndarray] = None  # padded-stream suffix
        self._tail = np.zeros((0,), np.float32)  # last pad+1 raw samples

    def _emit(self, final: bool) -> np.ndarray:
        """Consume full frames from the buffer in fixed-size blocks."""
        out = []
        n_fft, hop, block = self.n_fft, self.hop, self.block
        nf_block = (block - n_fft) // hop + 1
        while self._buf is not None and len(self._buf) >= (
            block if not final else n_fft
        ):
            take = min(block, len(self._buf))
            nf = min((take - n_fft) // hop + 1, nf_block)
            chunk = np.zeros((block,), np.float32)
            chunk[:take] = self._buf[:take]
            fb = np.asarray(
                _fbank_frames_raw(jnp.asarray(chunk), self.sr, self.n_mels,
                                  self.win_ms, self.stride_ms)
            )
            out.append(fb[:nf])
            self._buf = self._buf[nf * hop:]
        return (np.concatenate(out, 0) if out
                else np.zeros((0, self.n_mels), np.float32))

    def push(self, samples: np.ndarray) -> np.ndarray:
        """Feed samples; returns the frames completed by this chunk."""
        samples = np.asarray(samples, np.float32).reshape(-1)
        if self._buf is None:
            self._pre = np.concatenate([self._pre, samples])
            if len(self._pre) < self.pad + 1:
                return np.zeros((0, self.n_mels), np.float32)
            # left reflect pad: y[pad], ..., y[1] prepended
            left = self._pre[1 : self.pad + 1][::-1]
            self._buf = np.concatenate([left, self._pre])
            samples = self._pre
            self._pre = np.zeros((0,), np.float32)
        else:
            self._buf = np.concatenate([self._buf, samples])
        k = self.pad + 1
        self._tail = np.concatenate([self._tail, samples])[-k:]
        return self._emit(final=False)

    def close(self) -> np.ndarray:
        """Right-reflect-pad and emit the remaining frames."""
        if self._buf is None:
            if len(self._pre) == 0:
                return np.zeros((0, self.n_mels), np.float32)
            # short stream: fall back to the one-shot path
            return np.asarray(log_mel_fbank(
                jnp.asarray(self._pre), self.sr, self.n_mels,
                self.win_ms, self.stride_ms,
            ))
        # right reflect pad: y[-2], ..., y[-pad-1] appended
        right = self._tail[:-1][::-1][: self.pad]
        self._buf = np.concatenate([self._buf, right])
        return self._emit(final=True)
