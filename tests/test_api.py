import numpy as np
import jax

from ss_asr_tpu.api import Transcriber
from ss_asr_tpu.models import las
from ss_asr_tpu.utils import checkpoint as ckpt


def test_transcriber_from_checkpoint(tmp_path, rng):
    cfg = las.ASRConfig(
        encoder_state_size=8, decoder_state_size=8, mlp_out_size=8, feature_dim=40
    )
    params = las.init_asr(jax.random.key(0), cfg)
    p = str(tmp_path / "asr.npz")
    ckpt.save_pytree(p, params)

    config = {"asr": {"mdl": {"encoder_state_size": 8, "decoder_state_size": 8,
                              "mlp_out_size": 8, "feature_dim": 40}}}
    t = Transcriber.from_checkpoint(p, config, sr=8000, t_bucket=16, max_steps=10)

    out = t.transcribe_signal(rng.standard_normal(4000).astype(np.float32), sr=8000)
    assert isinstance(out, str)

    outs = t.transcribe_fbank([
        rng.standard_normal((30, 40)).astype(np.float32),
        rng.standard_normal((20, 40)).astype(np.float32),
    ])
    assert len(outs) == 2 and all(isinstance(o, str) for o in outs)


def test_transcriber_wav(tmp_path, rng):
    import wave

    cfg = las.ASRConfig(
        encoder_state_size=8, decoder_state_size=8, mlp_out_size=8, feature_dim=40
    )
    params = las.init_asr(jax.random.key(1), cfg)
    p = str(tmp_path / "asr.npz")
    ckpt.save_pytree(p, params)
    wav = tmp_path / "u.wav"
    y = (0.1 * rng.standard_normal(8000) * 32767).astype(np.int16)
    with wave.open(str(wav), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(y.tobytes())
    config = {"asr": {"mdl": {"encoder_state_size": 8, "decoder_state_size": 8,
                              "mlp_out_size": 8, "feature_dim": 40}}}
    t = Transcriber.from_checkpoint(p, config, sr=8000, t_bucket=16, max_steps=8)
    assert isinstance(t.transcribe_wav(str(wav)), str)


def test_transcribe_stream_matches_signal(tmp_path):
    """Chunked transcription == whole-signal transcription."""
    import jax

    from ss_asr_tpu.api import Transcriber
    from ss_asr_tpu.models import las

    cfg = las.ASRConfig(encoder_state_size=8, decoder_state_size=8,
                        mlp_out_size=8, feature_dim=40)
    params = las.init_asr(jax.random.key(0), cfg)
    t = Transcriber(params, cfg, sr=8000, max_steps=8)
    rng = np.random.default_rng(0)
    y = rng.standard_normal(20000).astype(np.float32)
    whole = t.transcribe_signal(y)
    chunked = t.transcribe_stream(y[i:i + 3000] for i in range(0, len(y), 3000))
    assert chunked == whole


def test_transcriber_empty_inputs(rng):
    """Empty batch / zero-frame audio must return empty transcripts, not
    crash in the listener scan."""
    import jax

    from ss_asr_tpu.models import las
    from ss_asr_tpu.api import Transcriber

    cfg = las.ASRConfig(encoder_state_size=8, decoder_state_size=8,
                        mlp_out_size=8, feature_dim=8)
    t = Transcriber(las.init_asr(jax.random.key(0), cfg), cfg, max_steps=4)
    assert t.transcribe_fbank([]) == []
    out = t.transcribe_fbank([np.zeros((0, 8), np.float32)])
    assert out == [""]
    # zero-frame row MIXED with real audio: still "" for the empty one
    mixed = t.transcribe_fbank(
        [np.zeros((0, 8), np.float32), rng.standard_normal((12, 8)).astype(np.float32)]
    )
    assert len(mixed) == 2 and mixed[0] == ""


def test_auto_kernel_choice_resolution(monkeypatch, rng):
    """'auto' routes greedy to the fused kernels on TPU within size limits,
    and to XLA everywhere else (CPU, mesh, beam, oversized decoder)."""
    import pytest

    from ss_asr_tpu.ops import rnn

    cfg = las.ASRConfig(encoder_state_size=8, decoder_state_size=8,
                        mlp_out_size=8, feature_dim=40)
    params = las.init_asr(jax.random.key(0), cfg)

    # this suite pins JAX_PLATFORMS=cpu -> auto resolves to the XLA paths
    t = Transcriber(params, cfg, use_pallas_kernel="auto")
    assert t.use_pallas_kernel is False

    # pretend-TPU: greedy within limits -> kernels on
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert Transcriber._auto_kernel_choice(cfg, None, beam_size=1) is True
    # the global scan/interpret opt-outs override 'auto' (round-4 advisor)
    for knob, val in (("SPELL_IMPL", "scan"), ("LSTM_IMPL", "scan"),
                      ("PALLAS_INTERPRET", True)):
        monkeypatch.setattr(rnn, knob, val)
        assert Transcriber._auto_kernel_choice(cfg, None, beam_size=1) is False
        monkeypatch.undo()
        monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # beam follows the committed decode_throughput record, both directions
    import ss_asr_tpu.api as api_mod

    monkeypatch.setattr(api_mod, "_recorded_beam_kernel_wins", lambda: False)
    assert Transcriber._auto_kernel_choice(cfg, None, beam_size=8) is False
    monkeypatch.setattr(api_mod, "_recorded_beam_kernel_wins", lambda: True)
    assert Transcriber._auto_kernel_choice(cfg, None, beam_size=8) is True
    # only the probe-verified width (8) may route to the fused frontier
    assert Transcriber._auto_kernel_choice(cfg, None, beam_size=4) is False
    # oversized decoder exceeds the probe-verified kernel ceiling
    big = las.ASRConfig(encoder_state_size=8, mlp_out_size=8, feature_dim=40,
                        decoder_state_size=rnn.SPELL_KERNEL_MAX_H + 1)
    assert Transcriber._auto_kernel_choice(big, None, beam_size=1) is False
    monkeypatch.undo()

    # anything else is a loud error, not a silent bool()
    with pytest.raises(ValueError, match="use_pallas_kernel"):
        Transcriber(params, cfg, use_pallas_kernel="yes")

    # mesh keeps its existing incompatibility error with an explicit True,
    # and auto never picks kernels on a mesh (checked via the resolver —
    # building a real mesh here would pull 8 devices for one predicate)
    assert Transcriber._auto_kernel_choice(cfg, object(), beam_size=1) is False


def test_recorded_beam_kernel_wins_predicate(monkeypatch):
    """The beam-routing bar: kernel routes ONLY on a clean sweep of the
    comparable recorded rows; absent/partial/mixed records stay XLA."""
    import ss_asr_tpu.api as api_mod

    def with_table(tp):
        monkeypatch.setattr(api_mod, "_recorded_decode_throughput",
                            lambda: tp)
        return api_mod._recorded_beam_kernel_wins()

    assert with_table(None) is False  # no record
    assert with_table({}) is False
    # no comparable pairs (only greedy rows)
    assert with_table({"greedy_pallas@B32": {"utt_per_s": 9.0}}) is False
    row = lambda v: {"utt_per_s": v}  # noqa: E731
    # clean sweep over every present pair -> route
    assert with_table({
        "beam8@B32": row(100), "beam8_pallas@B32": row(150),
        "beam8_lm@B32": row(90), "beam8_pallas_lm@B32": row(120),
    }) is True
    # one loss anywhere -> stay on XLA
    assert with_table({
        "beam8@B32": row(100), "beam8_pallas@B32": row(150),
        "beam8_lm@B64": row(90), "beam8_pallas_lm@B64": row(80),
    }) is False
    # an errored variant row (no utt_per_s) doesn't crash or count
    assert with_table({
        "beam8@B32": row(100), "beam8_pallas@B32": {"error": "VMEM"},
        "beam8_lm@B32": row(90), "beam8_pallas_lm@B32": row(120),
    }) is True
