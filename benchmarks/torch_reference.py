"""PyTorch baseline: a from-scratch implementation of the reference's LAS
train step (same architecture spec as SURVEY.md §2.2) used only as the
``vs_baseline`` denominator in bench.py.

This is NOT a copy of the reference code — it is a minimal reimplementation
of the published architecture (listener 3x pyramidal BiLSTM + BiLSTM,
content attention, 2-cell LSTM speller, per-utterance-normalized CE,
Adadelta lr=1.0, clip 5) so the torch-vs-JAX comparison measures frameworks,
not implementations.
"""

from __future__ import annotations

import time

import torch
import torch.nn as nn
import torch.nn.functional as F

VOCAB = 50


class TorchLAS(nn.Module):
    def __init__(self, feat=40, enc=256, dec=256, mlp=128, vocab=VOCAB):
        super().__init__()
        self.p1 = nn.LSTM(feat, enc, bidirectional=True, batch_first=True)
        self.p2 = nn.LSTM(4 * enc, enc, bidirectional=True, batch_first=True)
        self.p3 = nn.LSTM(4 * enc, enc, bidirectional=True, batch_first=True)
        self.b4 = nn.LSTM(4 * enc, enc, bidirectional=True, batch_first=True)
        self.phi = nn.Linear(dec, mlp, bias=False)
        self.psi = nn.Linear(2 * enc, mlp)
        self.cell1 = nn.LSTMCell(2 * enc + dec, dec)
        self.cell2 = nn.LSTMCell(dec, dec)
        self.embed = nn.Embedding(vocab, dec)
        self.char_trans = nn.Linear(dec, vocab)
        self.dec_size = dec

    @staticmethod
    def _down(x):
        b, t, f = x.shape
        t2 = (t // 2) * 2
        return x[:, :t2].reshape(b, t2 // 2, 2 * f)

    def forward(self, x, y):
        h, _ = self.p1(x)
        h, _ = self.p2(self._down(h))
        h, _ = self.p3(self._down(h))
        h, _ = self.b4(self._down(h))
        comp_h = torch.tanh(self.psi(h))  # [B,S,m]
        B, L = y.shape
        s1 = (x.new_zeros(B, self.dec_size), x.new_zeros(B, self.dec_size))
        s2 = (x.new_zeros(B, self.dec_size), x.new_zeros(B, self.dec_size))
        last = self.embed(torch.zeros(B, dtype=torch.long))
        outs = []
        for t in range(L - 1):
            q = torch.tanh(self.phi(s1[0]))
            energy = torch.einsum("bsm,bm->bs", comp_h, q)
            score = torch.softmax(energy, dim=-1)
            ctx = torch.einsum("bs,bsf->bf", score, h)
            s1 = self.cell1(torch.cat([last, ctx], dim=-1), s1)
            s2 = self.cell2(s1[0], s2)
            logits = self.char_trans(s2[0])
            outs.append(logits)
            last = self.embed(y[:, t + 1])
        return torch.stack(outs, dim=1)


def measure_train_step(B=32, T=512, L=48, iters=3, warmup=1) -> float:
    """Returns utterances/sec for the torch LAS train step on this host."""
    torch.manual_seed(0)
    model = TorchLAS()
    opt = torch.optim.Adadelta(model.parameters(), lr=1.0, eps=1e-8)
    x = torch.randn(B, T, 40)
    y = torch.randint(1, VOCAB, (B, L))

    def step():
        opt.zero_grad()
        logits = model(x, y)
        label = y[:, 1:]
        loss = F.cross_entropy(
            logits.reshape(-1, VOCAB), label.reshape(-1), ignore_index=0, reduction="none"
        )
        loss = loss.view(B, -1).sum(-1) / (y != 0).sum(-1).float()
        loss.mean().backward()
        nn.utils.clip_grad_norm_(model.parameters(), 5.0)
        opt.step()

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = (time.perf_counter() - t0) / iters
    return B / dt
