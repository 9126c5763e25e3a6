"""Character sets, label conversion, and string metrics.

Reimplements (reference cites):
  - voc tables and ``str_filt``         (``utils/util.py:12-32``,
                                         ``interfaces/base.py:171-180``)
  - CTC greedy blank-collapse decode    (``utils/metrics.py:71-92``)
  - text normalization for ASTER eval   (``utils/metrics.py:15-17``)
  - the collate's label "spreading"     (``dataset/dataset.py:2026-2036``)
  - Levenshtein distance for NED        (``editdistance`` use at
                                         ``interfaces/super_resolution.py``)
"""

from __future__ import annotations

import string
from functools import lru_cache
from typing import Sequence

import numpy as np

# Blank-first alphabet used by the CRNN text-prior generator and judge
# (reference ``main.py:137``, ``utils/metrics.py:71``).
CRNN_ALPHABET = "-0123456789abcdefghijklmnopqrstuvwxyz"
N_CRNN_CLASSES = len(CRNN_ALPHABET)  # 37


@lru_cache(maxsize=None)
def voc_table(voc_type: str, chinese_path: str | None = None) -> str:
    tables = {
        "digit": string.digits,
        "lower": string.digits + string.ascii_lowercase,
        "upper": string.digits + string.ascii_letters,
        "all": string.digits + string.ascii_letters + string.punctuation,
    }
    if voc_type == "chinese":
        # the 3965-char alphabet ships as package data (the reference keeps
        # ``al_chinese.txt`` at its repo root and opens it CWD-relative,
        # ``main.py:140-142`` / ``dataset.py:1660-1667``); resolve missing /
        # relative paths against the package so any CWD works
        import os

        packaged = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "data",
            "al_chinese.txt",
        )
        if chinese_path is None or not os.path.exists(chinese_path):
            chinese_path = packaged
        with open(chinese_path, encoding="utf-8") as fh:
            return fh.readlines()[0].replace("\n", "")
    return tables[voc_type]


def str_filt(s: str, voc_type: str, chinese_path: str | None = None) -> str:
    """Vocabulary filtering used by the accuracy protocol
    (``utils/util.py:12-32``): lowercases for 'lower', drops out-of-voc chars.
    """
    table = voc_table(voc_type, chinese_path)
    if voc_type == "lower":
        s = s.lower()
    if voc_type == "chinese":
        s = "".join(
            ch
            for ch in s
            if "一" <= ch <= "龥" or ch in string.digits + string.ascii_letters
        )
    return "".join(ch for ch in s if ch in table)


def normalize_text(text: str) -> str:
    """ASTER-eval normalization (``utils/metrics.py:15-17``)."""
    return "".join(
        ch for ch in text if ch in string.digits + string.ascii_letters
    ).lower()


def ctc_greedy_decode(
    logits: np.ndarray, alphabet: str = CRNN_ALPHABET
) -> list[str]:
    """Greedy CTC decode with blank collapse.

    ``logits``: [T, B, C] (reference CRNN emits [26, B, 37]); mirrors
    ``get_string_crnn`` (``utils/metrics.py:71-92``) including its quirk of
    resetting the repeat-tracker on blanks (so "a-a" decodes to "aa").
    """
    logits = np.asarray(logits)
    best = logits.argmax(-1).T  # [B, T]
    out = []
    for row in best:
        s, last = "", ""
        for idx in row:
            ch = alphabet[int(idx)]
            if ch != last:
                if idx != 0:
                    s += ch
                    last = ch
                else:
                    last = ""
        out.append(s)
    return out


def spread_label(word: str, max_len: int = 26) -> str:
    """Interleave '-' padding between characters so a short word spans the
    26 CTC time slots (``dataset/dataset.py:2026-2036``)."""
    word = word.lower()
    if len(word) <= 1:
        return word
    if len(word) >= max_len:
        return word[:max_len]
    padding = (max_len - len(word)) // (len(word) - 1)
    out = word[0]
    for ch in word[1:]:
        out += "-" * padding + ch
    return out


def encode_label_vecs(
    labels: Sequence[str],
    alphabet: str,
    max_len: int = 26,
    eval_perturb: bool = False,
    spread: bool = True,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Build the collate label tensors.

    Returns ``(label_rebatches [B, C, 1, T], ctc_ids flat int array,
    weighted_tics [B])`` matching ``alignCollate_realWTLAMask.__call__``
    (``dataset/dataset.py:1979-2076``).  ``eval_perturb`` reproduces the
    eval-collate's ``word[2]='e'`` perturbation (``dataset.py:1928-1931``) —
    off by default; the train collate has it disabled.
    """
    if not alphabet.startswith("-"):
        alphabet = "-" + alphabet
    a2d = {ch: i for i, ch in enumerate(alphabet)}
    alsize = len(a2d)
    batch = np.zeros((len(labels), max_len, alsize), dtype=np.float32)
    ctc_ids: list[int] = []
    tics = np.zeros((len(labels),), dtype=np.int32)
    for b, word in enumerate(labels):
        word = word.lower()
        if eval_perturb and len(word) > 4:
            word = word[:2] + "e" + word[3:]
        word = spread_label(word, max_len) if spread else word[:max_len]
        ids = [a2d[ch] for ch in word if ch in a2d]
        if len(ids) == 0:
            ctc_ids.append(0)
            batch[b, 0, 0] = 1.0
            tics[b] = 0
        else:
            ctc_ids.extend(ids)
            batch[b, np.arange(len(ids)), ids] = 1.0
            tics[b] = 1
    # [B, T, C] -> [B, C, 1, T]
    rebatches = batch.transpose(0, 2, 1)[:, :, None, :]
    return rebatches, np.asarray(ctc_ids, dtype=np.int32), tics


class AsterInfo:
    """ASTER vocabulary wrapper (``interfaces/base.py:862-874`` +
    ``utils/labelmaps.py:6-28``): voc = chars + [EOS, PADDING, UNKNOWN]."""

    def __init__(self, voc_type: str = "all", chinese_path: str | None = None):
        self.voc_type = voc_type
        self.EOS, self.PADDING, self.UNKNOWN = "EOS", "PADDING", "UNKNOWN"
        self.max_len = 100
        voc = list(voc_table(voc_type, chinese_path))
        voc += [self.EOS, self.PADDING, self.UNKNOWN]
        self.voc = voc
        self.char2id = {c: i for i, c in enumerate(voc)}
        self.id2char = {i: c for i, c in enumerate(voc)}
        self.rec_num_classes = len(voc)


def decode_aster_ids(ids, info: AsterInfo) -> list[str]:
    """``get_string_aster`` (``utils/metrics.py:20-68``): stop at EOS,
    skip UNKNOWN, then normalize to lowercase alphanumerics."""
    eos = info.char2id[info.EOS]
    unk = info.char2id[info.UNKNOWN]
    out = []
    for row in ids:
        chars = []
        for v in row:
            v = int(v)
            if v == eos:
                break
            if v != unk and v in info.id2char:
                chars.append(info.id2char[v])
        out.append(normalize_text("".join(chars)))
    return out


def levenshtein(a: str, b: str) -> int:
    """Edit distance (replaces the reference's ``editdistance`` C module)."""
    if len(a) < len(b):
        a, b = b, a
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]
