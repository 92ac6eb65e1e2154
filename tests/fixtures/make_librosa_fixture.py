"""Generate the librosa-0.6 golden fixture OFF-ENVIRONMENT.

Run wherever librosa (ideally 0.6.x, the reference's pin) is installed:

    python tests/fixtures/make_librosa_fixture.py

and commit the resulting librosa06_golden.npz. The signal/seed must match
tests/test_frontend.py::test_librosa_golden_fixture exactly.
"""

import numpy as np

import librosa

rng = np.random.default_rng(20260819)
sr = 16000
y = rng.standard_normal(sr // 2).astype(np.float32)
mel = librosa.feature.melspectrogram(
    y=y, sr=sr, n_mels=40, n_fft=int(sr * 0.025), hop_length=int(sr * 0.010))
logmel = np.swapaxes(np.log(mel + np.finfo(float).eps).astype("float32"), 0, 1)
np.savez("librosa06_golden.npz", y=y, sr=sr, logmel=logmel)
print("wrote librosa06_golden.npz", logmel.shape, "librosa", librosa.__version__)
