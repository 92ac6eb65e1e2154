"""High-level inference API: checkpoint -> transcripts in three lines.

    from ss_asr_tpu.api import Transcriber
    t = Transcriber.from_checkpoint("result/exp/asr.npz", config)
    print(t.transcribe_wav("utt.wav"))

The reference has no equivalent (decoding requires assembling an ASRTester);
this is the serving-path surface: early-exit greedy by default, beam + LM
fusion when configured.
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ss_asr_tpu.data.asr_dataset import round_up
from ss_asr_tpu.data.audio import load_wav
from ss_asr_tpu.models import charlm as charlm_mod
from ss_asr_tpu.models import las
from ss_asr_tpu.ops.frontend import log_mel_fbank_batch
from ss_asr_tpu.utils import checkpoint as ckpt
from ss_asr_tpu.vocab import Mapper


def _fused_signal_greedy(params, cfg, buf, n_samples, sr, max_steps,
                         lm_params, lm_cfg, lm_weight, impl="xla"):
    """Waveforms -> frontend -> greedy decode as ONE cached executable —
    the serving_e2e shape bench.py measures; one dispatch per batch instead
    of frontend + decode programs per call."""
    from ss_asr_tpu.ops import rnn
    from ss_asr_tpu.ops.frontend import _use_pallas_frontend

    salt = rnn.impl_salt() + (_use_pallas_frontend(),)
    return _fused_signal_greedy_jit(
        params, cfg, buf, n_samples, sr, max_steps, lm_params, lm_cfg,
        lm_weight, impl, _salt=salt,
    )


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "sr", "max_steps", "lm_cfg", "lm_weight", "impl",
                     "_salt"),
)
def _fused_signal_greedy_jit(params, cfg, buf, n_samples, sr, max_steps,
                             lm_params, lm_cfg, lm_weight, impl="xla",
                             *, _salt=None):
    fb, fl = log_mel_fbank_batch(buf, n_samples, sr, n_mels=cfg.feature_dim)
    if impl == "pallas":
        from ss_asr_tpu.ops.pallas.decode import (
            greedy_decode_lm_pallas, greedy_decode_pallas,
        )

        if lm_params is not None:
            return greedy_decode_lm_pallas(
                params, cfg, fb, fl, lm_params, lm_weight, max_steps=max_steps
            )
        return greedy_decode_pallas(params, cfg, fb, fl, max_steps=max_steps)
    from ss_asr_tpu.decode.greedy import greedy_decode_early_exit

    return greedy_decode_early_exit(
        params, cfg, fb, fl, max_steps=max_steps, lm_params=lm_params,
        lm_cfg=lm_cfg, lm_weight=lm_weight,
    )


@functools.lru_cache(maxsize=1)
def _recorded_decode_throughput():
    """The committed batched decode A/B (docs/BENCH_DETAILS.json
    ``decode_throughput``, written by ``bench.py --metric
    decode_throughput`` on-chip), or None outside a repo checkout /
    before a record exists."""
    import json
    import os

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs", "BENCH_DETAILS.json")
    try:
        with open(path) as f:
            tp = json.load(f).get("decode_throughput")
        return tp if isinstance(tp, dict) else None
    except (OSError, ValueError):
        return None


def _recorded_beam_kernel_wins() -> bool:
    """True iff the recorded throughput table shows the fused beam kernel
    beating the XLA beam scan in EVERY comparable (±LM, batch) row — the
    routing bar for ``use_pallas_kernel='auto'`` beam decodes (a mixed or
    absent record keeps the known-good XLA path)."""
    tp = _recorded_decode_throughput()
    if not tp:
        return False
    wins = losses = 0
    for suffix in ("", "_lm"):
        for B in (32, 64):
            pal = tp.get(f"beam8_pallas{suffix}@B{B}", {}).get("utt_per_s")
            xla = tp.get(f"beam8{suffix}@B{B}", {}).get("utt_per_s")
            if pal is not None and xla is not None:
                if pal > xla:
                    wins += 1
                else:
                    losses += 1
    return wins > 0 and losses == 0


class Transcriber:
    def __init__(
        self,
        params: Dict,
        cfg: las.ASRConfig,
        lm_params: Optional[Dict] = None,
        lm_cfg: Optional[charlm_mod.CharLMConfig] = None,
        lm_weight: float = 0.0,
        beam_size: int = 1,
        max_steps: int = 200,
        sr: int = 22050,
        t_bucket: int = 128,
        use_pallas_kernel: bool = False,
        mesh: Optional[jax.sharding.Mesh] = None,
    ):
        """``mesh``: optional ``jax.sharding.Mesh`` with a ``"data"`` axis
        for scale-out serving — batch rows shard across the axis (params
        replicate once here; GSPMD propagates the row sharding through the
        whole decode program, so every chip decodes its slice and the
        early-exit all-reduce rides ICI). Batches pad up to a multiple of
        the axis size with zero-length rows.

        ``use_pallas_kernel``: True / False route decodes through the fused
        whole-loop Pallas kernels / the XLA scans; ``"auto"`` picks the
        kernels exactly where the recorded A/B says they win — greedy
        (±LM fusion) on TPU within the kernels' size ceilings
        (docs/BENCH_DETAILS.json ``decode_latency_p50_ms`` /
        ``decode_throughput``) — and the XLA paths everywhere else
        (CPU, mesh serving, beam, oversized decoders)."""
        if use_pallas_kernel == "auto":
            use_pallas_kernel = self._auto_kernel_choice(cfg, mesh, beam_size)
        elif not isinstance(use_pallas_kernel, bool):
            raise ValueError(
                f"use_pallas_kernel must be True, False, or 'auto'; got "
                f"{use_pallas_kernel!r}")
        self.mesh = mesh
        self._n_data = 1
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            if "data" not in mesh.axis_names:
                raise ValueError(
                    f"mesh needs a 'data' axis, has {mesh.axis_names}"
                )
            self._n_data = mesh.shape["data"]
            repl = NamedSharding(mesh, P())
            params = jax.device_put(params, repl)
            if lm_params is not None:
                lm_params = jax.device_put(lm_params, repl)
        if mesh is not None and use_pallas_kernel:
            raise ValueError(
                "mesh + use_pallas_kernel: the fused decode kernels carry "
                "no partitioning rules (unlike the train-path LSTM/spell "
                "kernels) — row-sharded inputs would fail to compile or "
                "silently gather to one device; use the XLA decode paths "
                "for mesh serving"
            )
        #: weights live in ONE tuple so a hot reload swaps the (ASR, LM)
        #: pair atomically — decode methods snapshot it once per call
        #: (serve.BatchingTranscriber.reload_params's no-torn-pair contract)
        self._w = (params, lm_params)
        self.cfg = cfg
        self.lm_cfg = lm_cfg
        self.lm_weight = lm_weight
        self.beam_size = beam_size
        self.max_steps = max_steps
        self.sr = sr
        self.t_bucket = t_bucket
        self.use_pallas_kernel = use_pallas_kernel
        self.mapper = Mapper()

    @staticmethod
    def _auto_kernel_choice(cfg, mesh, beam_size: int) -> bool:
        """The data-driven half of ``use_pallas_kernel="auto"``.

        Greedy decode: the fused kernels are the recorded winner on TPU
        (0.75 ms/utt vs 1.59 early-exit marginal, BENCH_DETAILS
        decode_latency; batched rows in decode_throughput). Beam: routed
        per the recorded batched A/B — the fused frontier kernel wins only
        if every comparable ``beam8_pallas*`` row in the committed
        ``decode_throughput`` table beats its XLA ``beam8*`` counterpart
        (``_recorded_beam_kernel_wins``); no record, or a mixed one, stays
        on the XLA early-exit scan. Mesh serving and oversized decoders
        have no kernel partitioning rules / no probe-verified footprint,
        so they route to XLA."""
        from ss_asr_tpu.ops import rnn

        if mesh is not None:
            return False
        if jax.default_backend() != "tpu":
            return False
        # honor the global kernel opt-outs (ops/rnn.py escape hatches):
        # a user who forced the scan paths — or interpret mode — must not
        # have 'auto' route serving decodes through the fused kernels
        if rnn.SPELL_IMPL == "scan" or rnn.LSTM_IMPL == "scan":
            return False
        if rnn.PALLAS_INTERPRET:
            return False
        if cfg.decoder_state_size > rnn.SPELL_KERNEL_MAX_H:
            return False
        if beam_size > 1:
            # the recorded rows cover beam_size=8 (the serving default);
            # other widths have no probe-verified footprint
            return beam_size == 8 and _recorded_beam_kernel_wins()
        return True

    @property
    def params(self) -> Dict:
        return self._w[0]

    @params.setter
    def params(self, v: Dict) -> None:
        self._w = (v, self._w[1])

    @property
    def lm_params(self) -> Optional[Dict]:
        return self._w[1]

    @lm_params.setter
    def lm_params(self, v: Optional[Dict]) -> None:
        self._w = (self._w[0], v)

    def _place_rows(self, x: np.ndarray, lens: np.ndarray):
        """Device placement for a [B, ...] batch: row-sharded over the
        mesh's data axis when serving on a mesh, plain transfer otherwise."""
        if self.mesh is None:
            return jnp.asarray(x), jnp.asarray(lens)
        from jax.sharding import NamedSharding, PartitionSpec as P

        row = ("data",) + (None,) * (x.ndim - 1)
        return (
            jax.device_put(x, NamedSharding(self.mesh, P(*row))),
            jax.device_put(lens, NamedSharding(self.mesh, P("data"))),
        )

    @classmethod
    def from_checkpoint(
        cls,
        asr_path: str,
        config: Optional[dict] = None,
        lm_path: Optional[str] = None,
        **kw,
    ) -> "Transcriber":
        config = config or {}
        cfg = las.ASRConfig.from_dict(config.get("asr", {}).get("mdl", {}))
        params = jax.tree.map(jnp.asarray, ckpt.load_auto(asr_path))
        lm_params = lm_cfg = None
        if lm_path is not None:
            lm_c = config.get("char_lm", {})
            lm_cfg = charlm_mod.CharLMConfig.from_dict(lm_c.get("mdl", lm_c))
            lm_params = jax.tree.map(jnp.asarray, ckpt.load_auto(lm_path))
            kw.setdefault(
                "lm_weight", config.get("asr", {}).get("decode_lm_weight", 0.5)
            )
        kw.setdefault("beam_size", config.get("asr", {}).get("decode_beam_size", 1))
        return cls(params, cfg, lm_params=lm_params, lm_cfg=lm_cfg, **kw)

    # ------------------------------------------------------------------
    def _prepare_batch(self, fbanks):
        """Normalize a fbank list into a placed, bucket-padded batch.

        Returns ``None`` when every row is empty, else
        ``(n_real, empty_mask, xd, lensd)`` — xd/lensd are device-placed
        (row-sharded on a mesh); padded rows are zero-length.
        """
        n_real = len(fbanks)
        lens = np.array([f.shape[0] for f in fbanks], dtype=np.int32)
        if int(lens.max()) == 0:
            # silent/empty audio: zero frames -> empty transcripts, not a
            # zero-width buffer crashing the listener scan
            return None
        empty = lens == 0  # zero-frame rows mixed into a non-empty batch
        B = round_up(n_real, self._n_data)  # mesh row multiple
        T = round_up(int(lens.max()), self.t_bucket)
        x = np.zeros((B, T, self.cfg.feature_dim), dtype=np.float32)
        for i, f in enumerate(fbanks):
            x[i, : f.shape[0]] = f
        lens = np.concatenate(
            [lens, np.zeros((B - n_real,), np.int32)]).astype(np.int32)
        xd, lensd = self._place_rows(x, lens)
        return n_real, empty, xd, lensd

    def transcribe_fbank(
        self, fbanks: Union[np.ndarray, Sequence[np.ndarray]]
    ) -> List[str]:
        """[T, feat] or list thereof -> transcripts."""
        if isinstance(fbanks, np.ndarray) and fbanks.ndim == 2:
            fbanks = [fbanks]
        fbanks = list(fbanks)
        if not fbanks:
            return []
        prep = self._prepare_batch(fbanks)
        if prep is None:
            return ["" for _ in fbanks]
        n_real, empty, x, lens = prep

        params, lm_params = self._w  # one snapshot: no torn (ASR, LM) pair
        use_lm = lm_params is not None and self.lm_weight != 0.0
        if self.beam_size > 1 and self.use_pallas_kernel:
            from ss_asr_tpu.ops.pallas.beam import beam_decode_pallas

            # fixed-trip fused frontier (ops/pallas/beam.py); callers pick
            # max_steps by expected transcript length — the A/B vs the XLA
            # early-exit scan is bench.py decode_throughput's beam rows
            toks, _ = beam_decode_pallas(
                params, self.cfg, x, lens,
                beam_size=self.beam_size, max_steps=self.max_steps,
                lm_params=lm_params if use_lm else None,
                lm_cfg=self.lm_cfg, lm_weight=self.lm_weight,
            )
        elif self.beam_size > 1:
            from ss_asr_tpu.decode.beam import beam_decode

            toks, _ = beam_decode(
                params, self.cfg, x, lens,
                beam_size=self.beam_size, max_steps=self.max_steps,
                lm_params=lm_params if use_lm else None,
                lm_cfg=self.lm_cfg, lm_weight=self.lm_weight,
            )
        elif self.use_pallas_kernel and use_lm:
            from ss_asr_tpu.ops.pallas.decode import greedy_decode_lm_pallas

            toks, _ = greedy_decode_lm_pallas(
                params, self.cfg, x, lens,
                lm_params, self.lm_weight, max_steps=self.max_steps,
            )
        elif self.use_pallas_kernel:
            from ss_asr_tpu.ops.pallas.decode import greedy_decode_pallas

            toks, _ = greedy_decode_pallas(
                params, self.cfg, x, lens, max_steps=self.max_steps
            )
        else:
            from ss_asr_tpu.decode.greedy import greedy_decode_early_exit

            toks, _ = greedy_decode_early_exit(
                params, self.cfg, x, lens, max_steps=self.max_steps,
                lm_params=lm_params if use_lm else None,
                lm_cfg=self.lm_cfg, lm_weight=self.lm_weight,
            )
        out = [self.mapper.translate(t) for t in np.asarray(toks)[:n_real]]
        # a zero-frame row has no audio to attend to (the NaN-guard clamp
        # makes it attend to one padding step) — its transcript is ""
        return ["" if e else o for e, o in zip(empty, out)]

    def transcribe_fbank_detailed(
        self,
        fbanks: Union[np.ndarray, Sequence[np.ndarray]],
        n_best: int = 1,
        timestamps: bool = True,
    ) -> List[List["align_mod.Hypothesis"]]:
        """Rich decode: n-best hypotheses with scores, confidence, and
        per-character timestamps (attention forced alignment).

        Returns one ``List[Hypothesis]`` per input (best first).  ``n_best``
        > 1 decodes with a beam of ``max(beam_size, n_best)`` and returns
        the frontier — the input to LM-rescoring pipelines.  With
        ``timestamps`` (default) every hypothesis carries ``char_starts``
        (seconds) and ``avg_logprob`` confidence from a teacher-forced
        alignment pass; without, timing arrays are empty and score /
        avg_logprob are the beam search's own, or NaN on the greedy path
        (greedy computes no score — NaN says "not computed", never a
        fabricated certainty).
        """
        from ss_asr_tpu.decode import align as align_mod

        if n_best < 1:
            raise ValueError(f"n_best must be >= 1, got {n_best}")
        if isinstance(fbanks, np.ndarray) and fbanks.ndim == 2:
            fbanks = [fbanks]
        fbanks = list(fbanks)
        if not fbanks:
            return []
        empty_hyp = align_mod.Hypothesis(
            text="", score=0.0, avg_logprob=0.0,
            char_starts=np.zeros((0,), np.float32),
            char_frames=np.zeros((0,), np.int32),
        )
        prep = self._prepare_batch(fbanks)
        if prep is None:
            return [[empty_hyp] for _ in fbanks]
        n_real, empty, xd, lensd = prep

        params, lm_params = self._w
        use_lm = lm_params is not None and self.lm_weight != 0.0
        lm = lm_params if use_lm else None
        lmw = self.lm_weight if use_lm else 0.0

        if n_best > 1 or self.beam_size > 1:
            from ss_asr_tpu.decode.beam import beam_decode_nbest

            K = max(self.beam_size, n_best)
            toks, tok_lens, scores = beam_decode_nbest(
                params, self.cfg, xd, lensd, beam_size=K,
                max_steps=self.max_steps, lm_params=lm, lm_cfg=self.lm_cfg,
                lm_weight=lmw, n_best=n_best,
            )  # [B, n, S], [B, n], [B, n]
        else:
            from ss_asr_tpu.decode.greedy import greedy_decode_early_exit

            g_toks, g_lens = greedy_decode_early_exit(
                params, self.cfg, xd, lensd, max_steps=self.max_steps,
                lm_params=lm, lm_cfg=self.lm_cfg, lm_weight=lmw,
            )
            toks = np.asarray(g_toks)[:, None, :]
            tok_lens = np.asarray(g_lens)[:, None].astype(np.int32)
            # greedy computes no hypothesis score; NaN = "not computed"
            # (only surfaced when timestamps are off — the align pass
            # below supplies real scores otherwise)
            scores = np.full(tok_lens.shape, np.nan, np.float32)
        n = toks.shape[1]

        # one batched alignment pass over all B*n hypotheses — the
        # listener runs ONCE per utterance on the placed (row-sharded on a
        # mesh) decode inputs, memory tiled n-fold on device; executable
        # reuse via a bucketed char length
        L = int(tok_lens.max())
        if timestamps and L > 0:
            Lb = round_up(max(L, 1), 16)
            ids3 = toks[:, :, :Lb]
            if ids3.shape[2] < Lb:
                ids3 = np.pad(ids3, ((0, 0), (0, 0), (0, Lb - ids3.shape[2])))
            frames, logp = align_mod.force_align_nbest(
                params, self.cfg, xd, lensd, ids3,
                lm_params=lm, lm_cfg=self.lm_cfg, lm_weight=lmw,
            )
        out: List[List[align_mod.Hypothesis]] = []
        for b in range(n_real):
            if empty[b]:
                out.append([empty_hyp])
                continue
            if timestamps and L > 0:
                hyps = align_mod.build_hypotheses(
                    self.mapper, toks[b], tok_lens[b], frames[b], logp[b]
                )
                if n_best > 1 or self.beam_size > 1:
                    # keep the decoder's own (EOS-inclusive) ranking score;
                    # avg_logprob stays the alignment-pass confidence
                    for j, h in enumerate(hyps):
                        h.score = float(scores[b, j])
            else:
                hyps = [
                    align_mod.Hypothesis(
                        text=self.mapper.translate(toks[b, j]),
                        score=float(scores[b, j]),
                        avg_logprob=float(scores[b, j])
                        / max(int(tok_lens[b, j]), 1),
                        char_starts=np.zeros((0,), np.float32),
                        char_frames=np.zeros((0,), np.int32),
                    )
                    for j in range(n)
                ]
            out.append(hyps)
        return out

    def transcribe_signal_batch(
        self,
        signals: Sequence[np.ndarray],
        sr: Optional[int] = None,
        s_bucket_ms: int = 500,
    ) -> List[str]:
        """Batch of raw waveforms -> transcripts.

        Greedy configurations run frontend + decode as ONE fused program
        (beam runs the batched frontend then the beam program — its
        backtrack is host-side). Signal buffers bucket to an
        ``s_bucket_ms`` grid so the executable lattice stays small.
        """
        sr = sr or self.sr
        signals = [np.asarray(s, dtype=np.float32).reshape(-1)
                   for s in signals]
        if not signals:
            return []
        n_real = len(signals)
        lens = np.array([len(s) for s in signals], dtype=np.int32)
        if int(lens.max()) == 0:
            return ["" for _ in signals]
        step = max(int(sr * s_bucket_ms) // 1000, 1)
        S = -(-int(lens.max()) // step) * step
        B = round_up(n_real, self._n_data)  # mesh row multiple
        buf = np.zeros((B, S), dtype=np.float32)
        for i, s in enumerate(signals):
            buf[i, : len(s)] = s
        lens = np.concatenate(
            [lens, np.zeros((B - n_real,), np.int32)]).astype(np.int32)
        buf, jlens = self._place_rows(buf, lens)

        params, lm_params = self._w  # one snapshot: no torn (ASR, LM) pair
        use_lm = lm_params is not None and self.lm_weight != 0.0
        if self.beam_size > 1:
            from ss_asr_tpu.decode.beam import beam_decode

            fb, fl = log_mel_fbank_batch(buf, jlens, sr,
                                         n_mels=self.cfg.feature_dim)
            toks, _ = beam_decode(
                params, self.cfg, fb, fl,
                beam_size=self.beam_size, max_steps=self.max_steps,
                lm_params=lm_params if use_lm else None,
                lm_cfg=self.lm_cfg, lm_weight=self.lm_weight,
            )
        else:
            toks, _ = _fused_signal_greedy(
                params, self.cfg, buf, jlens, sr, self.max_steps,
                lm_params if use_lm else None, self.lm_cfg,
                self.lm_weight,
                impl="pallas" if self.use_pallas_kernel else "xla",
            )
        out = [self.mapper.translate(t) for t in np.asarray(toks)[:n_real]]
        # a zero-sample row has no audio (same contract as transcribe_fbank)
        return ["" if n == 0 else o for n, o in zip(lens[:n_real], out)]

    def transcribe_signal(self, y: np.ndarray, sr: Optional[int] = None) -> str:
        return self.transcribe_signal_batch([y], sr=sr)[0]

    def transcribe_stream(self, chunks, sr: Optional[int] = None) -> str:
        """Long-form audio from an iterable of sample chunks.

        The frontend runs incrementally (ops.frontend.StreamingFrontend, one
        fixed-shape XLA program for any stream length); decoding runs once on
        the assembled frames. Frames are identical to the one-shot path."""
        from ss_asr_tpu.ops.frontend import StreamingFrontend

        fe = StreamingFrontend(sr or self.sr, n_mels=self.cfg.feature_dim)
        parts = [fe.push(c) for c in chunks]
        parts.append(fe.close())
        fb = np.concatenate(parts, 0)
        return self.transcribe_fbank(fb)[0]

    def transcribe_wav(self, path: str) -> str:
        sr, y = load_wav(path, target_sr=self.sr)
        return self.transcribe_signal(y, sr)

    def transcribe_long(
        self,
        y: np.ndarray,
        sr: Optional[int] = None,
        window_s: float = 20.0,
        overlap_s: float = 2.0,
        vad: Optional[str] = None,
    ) -> str:
        """Long-form audio (beyond the model's trained utterance lengths):
        windows decoded as ONE batch, transcripts joined
        (decode.longform).

        Default: fixed overlapping windows, merged over the acoustic
        overlap (local-agreement seam).  ``vad="energy"``: cut at
        low-energy points instead — segments are disjoint (overlap_s,
        floored at window_s/10, becomes the minimum segment length) and
        their transcripts join
        with a space, since a pause is a word boundary.  window_s ~ the
        training distribution's utterance cap (Málrómur tops out near
        20 s).  Audio shorter than one window falls through to the plain
        path.
        """
        from ss_asr_tpu.decode.longform import (
            energy_segments,
            merge_window_texts,
            window_bounds,
        )
        from ss_asr_tpu.ops.frontend import compute_fbank

        if vad not in (None, "energy"):
            raise ValueError(f"vad must be None or 'energy', got {vad!r}")
        sr = sr or self.sr
        y = np.asarray(y, dtype=np.float32).reshape(-1)
        if y.size == 0:
            return ""
        win = max(1, int(window_s * sr))
        ov = max(0, min(int(overlap_s * sr), win - 1))
        if vad == "energy":
            # floor at win/10: overlap_s=0 would otherwise allow 1-sample
            # segments, shredding silence into per-hop micro-decodes
            bounds = energy_segments(y, sr, max_window=win,
                                     min_window=max(1, ov, win // 10))
        else:
            bounds = window_bounds(len(y), win, ov)
        if len(bounds) == 1:
            return self.transcribe_signal(y, sr)
        # frontend once over the whole signal, slice FRAMES per window —
        # cheaper than per-window frontends and numerically identical up
        # to the window-edge frames
        fb = np.asarray(compute_fbank(y, sr, n_mels=self.cfg.feature_dim))
        hop = sr // 100  # 10 ms frontend stride
        rows = []
        for s, e in bounds:
            fs, fe_ = s // hop, min(max(e // hop, s // hop + 1), fb.shape[0])
            rows.append(fb[fs:fe_])
        texts = self.transcribe_fbank(rows)
        if vad == "energy":
            return " ".join(t for t in texts if t)
        return merge_window_texts(texts, overlap_frac=ov / win)
