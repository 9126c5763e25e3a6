import jax
import jax.numpy as jnp
import numpy as np

from tatt_tpu.core.charset import AsterInfo, decode_aster_ids
from tatt_tpu.models.recognizers.aster import (
    AsterRecognizer,
    beam_backtrack,
    parse_aster_input,
)


def _tiny_aster(info):
    # full-architecture block plan but narrow channels for CPU speed
    model = AsterRecognizer(num_classes=info.rec_num_classes, max_len=8)
    return model


def test_aster_greedy_and_beam_agree():
    info = AsterInfo("all")
    model = AsterRecognizer(num_classes=info.rec_num_classes, max_len=6)
    x = parse_aster_input(jnp.ones((2, 3, 32, 100)) * 0.5)
    variables = model.init(jax.random.PRNGKey(0), x)

    preds, scores = model.apply(variables, x)
    assert preds.shape == (2, 6)

    symbols, predecessors, beam_scores = model.apply(
        variables, x, 1, method=AsterRecognizer.beam_tensors
    )
    seq = beam_backtrack(
        np.asarray(symbols), np.asarray(predecessors), np.asarray(beam_scores), 2, 1, info.char2id[info.EOS]
    )
    # width-1 beam == greedy
    np.testing.assert_array_equal(seq, np.asarray(preds))


def test_decode_aster_ids():
    info = AsterInfo("all")
    eos = info.char2id["EOS"]
    a = info.char2id["a"]
    B = info.char2id["B"]
    ids = np.array([[a, B, eos, a], [eos, a, a, a]])
    assert decode_aster_ids(ids, info) == ["ab", ""]
