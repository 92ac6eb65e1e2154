import numpy as np

from ss_asr_tpu.utils.editdistance import edit_distance, _edit_distance_py, _hash_tokens
from ss_asr_tpu.utils.metrics import calc_acc, calc_cer, calc_err, draw_att
from ss_asr_tpu.vocab import Mapper


def test_edit_distance_basics():
    assert edit_distance([], []) == 0
    assert edit_distance(["a"], []) == 1
    assert edit_distance([], ["a", "b"]) == 2
    assert edit_distance(list("kitten"), list("sitting")) == 3
    assert edit_distance(["the", "cat"], ["the", "cat"]) == 0
    assert edit_distance(["the", "cat"], ["the", "dog"]) == 1


def test_edit_distance_native_matches_python(rng):
    for _ in range(25):
        a = list(rng.integers(0, 5, size=rng.integers(0, 12)))
        b = list(rng.integers(0, 5, size=rng.integers(0, 12)))
        assert edit_distance(a, b) == _edit_distance_py(_hash_tokens(a), _hash_tokens(b))


def test_calc_acc_stops_at_pad():
    # label row 0: chars [3,4,1] then pad; only first 3 positions scored
    label = np.array([[3, 4, 1, 0, 0]])
    pred = np.array([[3, 9, 1, 7, 7]])
    assert calc_acc(pred, label) == 2.0 / 3.0


def test_calc_acc_from_logits():
    label = np.array([[3, 0]])
    logits = np.zeros((1, 2, 50))
    logits[0, 0, 3] = 5.0
    assert calc_acc(logits, label) == 1.0


def test_calc_err_word_level():
    m = Mapper()
    # label "ab cd", prediction "ab ce"
    label = m.encode("<ab cd>")[None, :]
    pred = m.encode("<ab ce>")[None, :]
    # 1 word substitution / 2 label words
    assert calc_err(pred, label, m) == 0.5


def test_calc_err_can_exceed_one():
    m = Mapper()
    label = m.encode("<ab>")[None, :]
    pred = m.encode("<cd ef gh>")[None, :]
    assert calc_err(pred, label, m) > 1.0


def test_calc_cer():
    m = Mapper()
    label = m.encode("<abcd>")[None, :]
    pred = m.encode("<abce>")[None, :]
    assert calc_cer(pred, label, m) == 0.25


def test_draw_att_trims_at_eos(rng):
    att = rng.random((2, 6, 10))
    hyps = [[4, 5, 1, 9, 9, 9], [4, 4, 4, 4, 4, 4]]
    maps = draw_att(att, hyps)
    assert maps[0].shape == (3, 3, 10)
    assert maps[1].shape == (3, 6, 10)


def test_with_terminal_eos_and_decode_acc():
    """A string-perfect free decode must score positionwise acc 1.0: the
    decoders strip the emitted EOS from toks (decode/greedy.py:_finalize),
    so the metric path reinserts it at ``length`` before comparing."""
    from ss_asr_tpu.utils.metrics import char_acc_row, with_terminal_eos

    label = np.array([8, 11, 9, 1, 0, 0, 0, 0], dtype=np.int32)  # "fig>"
    toks = np.array([8, 11, 9, 0, 0, 0, 0, 0], dtype=np.int32)  # EOS stripped
    assert char_acc_row(toks, label) == 0.75  # the raw row misses the EOS
    fixed = with_terminal_eos(toks, 3)
    assert fixed[3] == 1 and char_acc_row(fixed, label) == 1.0
    # step-cap decode (no EOS emitted): length == len(toks) -> unchanged,
    # and the label's EOS position correctly counts as a miss
    capped = with_terminal_eos(toks, len(toks))
    assert np.array_equal(capped, toks)
    assert char_acc_row(capped, label) == 0.75
