import numpy as np

from tatt_tpu.core.charset import (
    CRNN_ALPHABET,
    ctc_greedy_decode,
    encode_label_vecs,
    levenshtein,
    spread_label,
    str_filt,
)


def test_str_filt_lower():
    assert str_filt("AbC1!", "lower") == "abc1"
    assert str_filt("AbC1!", "upper") == "AbC1"
    assert str_filt("AbC1!", "all") == "AbC1!"
    assert str_filt("AbC1!", "digit") == "1"


def test_spread_label():
    # 26 slots, "ab" -> 'a' + 24 dashes + 'b'
    s = spread_label("ab")
    assert len(s) == 26 and s[0] == "a" and s[-1] == "b"
    assert set(s[1:-1]) == {"-"}
    # reference floors the padding: "abcde" -> pad 5 between each
    s = spread_label("abcde")
    assert s == "a-----b-----c-----d-----e"
    assert spread_label("x") == "x"
    assert len(spread_label("a" * 30)) == 26


def test_ctc_greedy_decode():
    T, B, C = 6, 2, len(CRNN_ALPHABET)
    logits = np.full((T, B, C), -10.0, dtype=np.float32)
    # batch 0: "a a - b b b" -> "ab" ; batch 1: "a - a" quirk -> "aa"
    a = CRNN_ALPHABET.index("a")
    b = CRNN_ALPHABET.index("b")
    for t, idx in enumerate([a, a, 0, b, b, b]):
        logits[t, 0, idx] = 0.0
    for t, idx in enumerate([a, 0, a, 0, 0, 0]):
        logits[t, 1, idx] = 0.0
    assert ctc_greedy_decode(logits) == ["ab", "aa"]


def test_encode_label_vecs():
    rebatch, ctc_ids, tics = encode_label_vecs(["ab", ""], CRNN_ALPHABET)
    assert rebatch.shape == (2, len(CRNN_ALPHABET), 1, 26)
    # one-hots: slot 0 is 'a', slot 25 is 'b', 24 dashes in between
    assert rebatch[0, CRNN_ALPHABET.index("a"), 0, 0] == 1
    assert rebatch[0, CRNN_ALPHABET.index("b"), 0, 25] == 1
    assert rebatch[0, 0, 0, 1:25].sum() == 24  # blank ids
    assert tics.tolist() == [1, 0]
    # empty word contributes a single 0 id and a blank one-hot at slot 0
    assert ctc_ids[-1] == 0
    assert rebatch[1, 0, 0, 0] == 1


def test_levenshtein():
    assert levenshtein("kitten", "sitting") == 3
    assert levenshtein("", "abc") == 3
    assert levenshtein("same", "same") == 0
