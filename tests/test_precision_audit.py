"""bf16-precision audit: pin every HIGHEST-sensitive contraction.

Three rounds of TPU-only training stalls came from the same blind spot:
CPU tests compute einsums/reductions in exact f32, while the TPU's
default matmul precision multiplies in bfloat16 — so a contraction whose
operands cancel (TPS solve, r4), whose variance is tiny relative to its
mean (SSIM variances, r2), or whose error compounds over a scan (CTC)
passes every CPU test and silently corrupts training on the chip only.

This module sweeps the step's sensitive contractions and pins each one
the way ``test_tps_parity.py`` pinned the TPS solve: inspect the jaxpr
for explicit HIGHEST/f32 attributes (works on CPU because it checks the
*request*, not the arithmetic), plus catastrophic-cancellation
functional probes where the jaxpr alone can't prove safety.

Sensitive-spot inventory (audited this round):
  - TPS solve (stn.py)                 -> pinned (test_tps_parity.py)
  - bicubic/bilinear resize matmuls    -> pinned here (jaxpr)
  - SSIM/TRI_SSIM window convs         -> pinned here (jaxpr + probe)
  - CTC log-semiring scan              -> f32 upcast pinned here
  - BatchNorm batch stats              -> f32 two-pass, probed here
  - LayerNorm stats                    -> f32, probed here
  - attention softmax                  -> f32 normalization pinned here
  - Pallas GRU in-kernel dots          -> preferred_element_type=f32 in
    the kernel source (pallas internals are opaque to jaxpr inspection);
    its h-state carry is an f32 VMEM scratch; covered by
    tests/test_pallas_gru.py equivalence at 1e-2/1e-5 tolerances.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

HI = (jax.lax.Precision.HIGHEST, jax.lax.Precision.HIGHEST)


def _dots(fn, *args):
    jaxpr = jax.make_jaxpr(fn)(*args)
    eqns = []

    def walk(jx):
        for e in jx.eqns:
            if e.primitive.name in ("dot_general", "conv_general_dilated"):
                eqns.append(e)
            for sub in jax.core.subjaxprs(e.params) if False else []:
                pass
        return jx

    walk(jaxpr.jaxpr)
    # include closed subjaxprs (scan/cond bodies, custom_vjp calls)
    stack = list(jaxpr.jaxpr.eqns)
    while stack:
        e = stack.pop()
        for v in e.params.values():
            if hasattr(v, "jaxpr"):  # ClosedJaxpr
                inner = v.jaxpr
                eqns.extend(
                    q
                    for q in inner.eqns
                    if q.primitive.name in ("dot_general", "conv_general_dilated")
                )
                stack.extend(inner.eqns)
            elif isinstance(v, (list, tuple)):
                for w in v:
                    if hasattr(w, "jaxpr"):
                        inner = w.jaxpr
                        eqns.extend(
                            q
                            for q in inner.eqns
                            if q.primitive.name
                            in ("dot_general", "conv_general_dilated")
                        )
                        stack.extend(inner.eqns)
    return eqns


def _assert_all_highest_f32(eqns, what):
    assert eqns, f"no contractions found for {what}"
    for e in eqns:
        assert e.params.get("precision") == HI, (
            f"{what}: {e.primitive.name} lost HIGHEST precision: "
            f"{e.params.get('precision')}"
        )
        for v in e.invars:
            if hasattr(v.aval, "dtype") and v.aval.dtype in (
                jnp.bfloat16,
                jnp.float16,
            ):
                raise AssertionError(f"{what}: contraction input is {v.aval.dtype}")


def test_resize_matmuls_pinned():
    """kernels/resize.py: both separable resize matmuls must be f32 +
    HIGHEST even for bf16 images (they feed parse_crnn_data -> the prior,
    and the eval protocol's bicubic)."""
    from tatt_tpu.kernels.resize import resize_bicubic, resize_bilinear

    x = jnp.zeros((2, 3, 16, 64), jnp.bfloat16)
    _assert_all_highest_f32(
        _dots(lambda im: resize_bicubic(im, 32, 100), x), "resize_bicubic"
    )
    _assert_all_highest_f32(
        _dots(lambda im: resize_bilinear(im, 32, 128), x), "resize_bilinear"
    )


def test_ssim_window_convs_pinned():
    """losses/ssim.py: the gaussian-window convs build E[x], E[x^2] whose
    difference is a variance ~1e-3 under a mean ~1.0 — bf16 eps at 1.0 is
    8e-3, i.e. the variance drowns entirely (the round-2 stall)."""
    from tatt_tpu.losses.ssim import ssim, tri_ssim

    a = jnp.zeros((2, 3, 32, 128), jnp.bfloat16)
    _assert_all_highest_f32(_dots(lambda u, v: ssim(u, v), a, a), "ssim")
    _assert_all_highest_f32(
        _dots(lambda u, v, w: tri_ssim(u, v, w), a, a, a), "tri_ssim"
    )


def test_ssim_variance_cancellation_probe():
    """Functional probe: SSIM of two near-identical images riding a large
    mean must stay near 1 and match the f64 formula — fails if any E[x^2]
    path drops below f32."""
    from tatt_tpu.losses.ssim import ssim

    rng = np.random.default_rng(0)
    base = 0.9 + 0.02 * rng.standard_normal((1, 3, 32, 128))
    x = jnp.asarray(base, jnp.bfloat16)
    y = jnp.asarray(base + 0.003 * rng.standard_normal(base.shape), jnp.bfloat16)
    got = float(ssim(x, y))
    assert 0.9 < got <= 1.0, got
    # identical images: exactly 1 regardless of the mean level
    assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)


def test_ctc_runs_in_f32():
    """kernels/ctc.py upcasts bf16 log-probs before the log-semiring scan:
    the nll from bf16 inputs must equal the nll from their exact f32
    values (upcast-then-scan), not a bf16-accumulated scan."""
    from tatt_tpu.kernels.ctc import ctc_loss

    rng = np.random.default_rng(1)
    t, b, c = 26, 4, 37
    logits = rng.standard_normal((t, b, c)).astype(np.float32)
    lp32 = jax.nn.log_softmax(jnp.asarray(logits), axis=-1)
    lp16 = lp32.astype(jnp.bfloat16)
    targets = jnp.asarray(rng.integers(1, c, (b, 8)), jnp.int32)
    il = jnp.full((b,), t, jnp.int32)
    tl = jnp.asarray([8, 5, 3, 0], jnp.int32)

    out16 = ctc_loss(lp16, targets, il, tl)
    assert out16.dtype == jnp.float32
    # reference: the same bf16 values scanned entirely in f32
    out_ref = ctc_loss(lp16.astype(jnp.float32), targets, il, tl)
    np.testing.assert_allclose(np.asarray(out16), np.asarray(out_ref), rtol=0, atol=0)


def test_batchnorm_stats_cancellation_probe():
    """BatchNorm2d computes batch stats in f32 (two-pass for the fused
    copies path): a bf16 activation with mean ~64 and variance ~1e-2 must
    normalize correctly — single-pass E[x^2]-E[x]^2 in bf16 would return
    garbage (negative variance)."""
    from tatt_tpu.models.common import BatchNorm2d

    rng = np.random.default_rng(2)
    x = (64.0 + 0.1 * rng.standard_normal((8, 16, 4, 8))).astype(np.float32)
    xb = jnp.asarray(x, jnp.bfloat16)

    bn = BatchNorm2d()
    vs = bn.init(jax.random.PRNGKey(0), xb, True)
    y, _ = bn.apply(vs, xb, True, mutable=["batch_stats"])
    y = np.asarray(y, np.float32)
    # normalized output: per-channel mean ~0, std ~1 (bf16 quantization of
    # the INPUT dominates the tolerance; stats themselves are f32)
    x_q = np.asarray(xb, np.float32)  # the values BN actually saw
    std_in = x_q.std(axis=(0, 2, 3))
    assert np.all(std_in > 0.01)
    assert np.abs(y.mean(axis=(0, 2, 3))).max() < 0.05
    assert np.abs(y.std(axis=(0, 2, 3)) - 1.0).max() < 0.1


def test_layernorm_stats_cancellation_probe():
    from tatt_tpu.models.transformer import LayerNorm

    rng = np.random.default_rng(3)
    # mean/std = 16 stresses the centering; std 0.5 stays well above the
    # bf16 input quantization at 8.0 (spacing 2^-5)
    x = (8.0 + 0.5 * rng.standard_normal((4, 26, 64))).astype(np.float32)
    xb = jnp.asarray(x, jnp.bfloat16)
    ln = LayerNorm()
    vs = ln.init(jax.random.PRNGKey(0), xb)
    y = np.asarray(ln.apply(vs, xb), np.float32)
    assert np.abs(y.mean(-1)).max() < 0.05
    assert np.abs(y.std(-1) - 1.0).max() < 0.15


def test_attention_softmax_normalizes_in_f32():
    """models/transformer.py: the QK^T logits accumulate to f32 and the
    softmax runs on f32 — under bf16 compute the returned (head-averaged)
    weights must be f32 and rows must sum to 1 at f32 accuracy."""
    from tatt_tpu.models.transformer import MultiheadAttention

    mha = MultiheadAttention(d_model=64, nhead=4)
    rng = np.random.default_rng(4)
    q = jnp.asarray(rng.standard_normal((2, 1024, 64)), jnp.bfloat16)
    kv = jnp.asarray(rng.standard_normal((2, 26, 64)), jnp.bfloat16)
    vs = mha.init(jax.random.PRNGKey(0), q, kv, kv)
    out, w = mha.apply(vs, q, kv, kv)
    assert out.dtype == jnp.bfloat16
    assert w.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(w.sum(-1)), 1.0, rtol=0, atol=1e-5
    )

    # jaxpr pin: the exp feeding the softmax reduction consumes f32
    jaxpr = jax.make_jaxpr(lambda v, a, b: mha.apply(v, a, b, b))(vs, q, kv)
    exps = [
        e
        for e in jaxpr.jaxpr.eqns
        if e.primitive.name == "exp"
        or (e.primitive.name == "pjit" and "exp" in str(e.params.get("name", "")))
    ]
    flat = []
    stack = list(jaxpr.jaxpr.eqns)
    while stack:
        e = stack.pop()
        for vv in e.params.values():
            if hasattr(vv, "jaxpr"):
                stack.extend(vv.jaxpr.eqns)
                flat.extend(q2 for q2 in vv.jaxpr.eqns if q2.primitive.name == "exp")
    exps += flat
    assert exps, "softmax exp not found"
    for e in exps:
        assert e.invars[0].aval.dtype == jnp.float32, (
            f"softmax exp runs in {e.invars[0].aval.dtype}, want f32"
        )
