import numpy as np
import jax.numpy as jnp

from cnn_quantization_tpu.ops import quant_math as qm


def np_fake_quant(x, delta, offset, qmax):
    """Independent numpy mirror of the gemmlowp true-zero fake-quant spec."""
    delta = np.asarray(delta, np.float32)
    qmax = np.asarray(qmax, np.float32)
    scale = np.where(qmax > 0, delta / np.maximum(qmax, 1), 0.0)
    scale = np.maximum(scale, 1e-8)
    zp = np.round(-np.asarray(offset, np.float32) / scale)
    q = np.clip(x / scale + zp, 0.0, qmax)
    q = np.round(q)  # numpy rounds half-to-even, like jnp
    return ((q - zp) * scale).astype(np.float32)


def test_hand_case_2bit():
    x = jnp.array([0.0, 0.5, 1.0])
    out = qm.fake_quant(x, delta=1.0, offset=0.0, qmax=3.0)
    # scale = 1/3; codes = [0, round(1.5)=2, 3]
    np.testing.assert_allclose(out, [0.0, 2 / 3, 1.0], rtol=1e-6)


def test_zero_exactly_representable():
    # true-zero: zero_point rounding guarantees 0 -> 0 exactly
    x = jnp.array([0.0, -1.0, 1.0, 0.3])
    out = qm.fake_quant(x, delta=2.0, offset=-1.0, qmax=255.0)
    assert float(out[0]) == 0.0


def test_matches_numpy_reference_per_tensor():
    rng = np.random.RandomState(0)
    x = rng.randn(64, 32).astype(np.float32)
    delta = float(x.max() - x.min())
    offset = float(x.min())
    for bits in (2, 4, 8):
        qmax = 2.0 ** bits - 1
        got = np.asarray(qm.fake_quant(x, delta, offset, qmax))
        want = np_fake_quant(x, delta, offset, qmax)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_matches_numpy_reference_per_channel_bit_alloc():
    rng = np.random.RandomState(1)
    x = rng.randn(8, 5, 5, 16).astype(np.float32) * rng.rand(16).astype(np.float32)
    min_c = x.min(axis=(0, 1, 2))
    max_c = x.max(axis=(0, 1, 2))
    bits = rng.randint(0, 9, size=16)
    qmax = 2.0 ** bits - 1
    got = np.asarray(qm.fake_quant(x, max_c - min_c, min_c, qmax, channel_axis=-1))
    want = np.stack([
        np_fake_quant(x[..., c], max_c[c] - min_c[c], min_c[c], qmax[c])
        for c in range(16)], axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-6)
    # zero-bit channels collapse to the zero point (dequant == constant)
    zero_ch = np.where(bits == 0)[0]
    for c in zero_ch:
        assert np.unique(np.asarray(got[..., c])).size == 1


def test_codes_roundtrip():
    rng = np.random.RandomState(2)
    x = rng.rand(100).astype(np.float32) * 4 - 1
    codes, (scale, zp) = qm.quantize_codes(x, 5.0, -1.0, 255.0)
    assert codes.min() >= 0 and codes.max() <= 255
    deq = qm.dequantize_codes(codes, scale, zp)
    np.testing.assert_allclose(deq, np.asarray(qm.fake_quant(x, 5.0, -1.0, 255.0)), atol=1e-6)


def test_alpha_to_delta_offset_half_range():
    d, o = qm.alpha_to_delta_offset(2.0, 10.0, -3.0, 0.5, half_range=True)
    assert float(d) == 2.5 and float(o) == 0.0
    d, o = qm.alpha_to_delta_offset(2.0, 10.0, -3.0, -0.5, half_range=True)
    assert float(d) == 2.0 and float(o) == 0.0


def test_alpha_to_delta_offset_symmetric():
    d, o = qm.alpha_to_delta_offset(2.0, 10.0, -3.0, 0.5, half_range=False)
    assert float(d) == 4.0
    assert float(o) == max(-3.0, 0.5 - 2.0)
    # clip2max caps the range at the observed one
    d, o = qm.alpha_to_delta_offset(20.0, 1.0, -1.0, 0.0, half_range=False, clip2max=True)
    assert float(d) == 2.0


def test_minmax_delta_offset():
    d, o = qm.minmax_delta_offset(-1.5, 2.5, half_range=False)
    assert (float(d), float(o)) == (4.0, -1.5)
    d, o = qm.minmax_delta_offset(-1.5, 2.5, half_range=True)
    assert (float(d), float(o)) == (2.5, 0.0)


def test_scale_floor():
    # degenerate range must not produce inf/nan
    out = qm.fake_quant(jnp.zeros(4), 0.0, 0.0, 255.0)
    assert np.all(np.isfinite(np.asarray(out)))
