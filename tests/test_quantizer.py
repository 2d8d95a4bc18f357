import numpy as np
import jax
import jax.numpy as jnp

from cnn_quantization_tpu.ops import QuantConfig, quantize_activation, quantize_weight
from cnn_quantization_tpu.ops import quant_math as qm


def test_per_tensor_minmax_avg_over_batch():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 6, 6, 8).astype(np.float32)
    cfg = QuantConfig(num_bits=8)
    out, _ = quantize_activation(x, cfg, tag='activation')
    mins = x.reshape(4, -1).min(axis=1).mean()
    maxs = x.reshape(4, -1).max(axis=1).mean()
    want = np.asarray(qm.fake_quant(x, maxs - mins, mins, 255.0))
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)


def test_classifier_tag_uses_global_minmax():
    rng = np.random.RandomState(1)
    x = rng.randn(4, 1000).astype(np.float32)
    cfg = QuantConfig(num_bits=8)
    out, _ = quantize_activation(x, cfg, tag='activation_classifier')
    want = np.asarray(qm.fake_quant(x, x.max() - x.min(), x.min(), 255.0))
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)


def test_pcq_a_per_channel_minmax():
    rng = np.random.RandomState(2)
    x = rng.randn(2, 5, 5, 8).astype(np.float32) * np.arange(1, 9, dtype=np.float32)
    cfg = QuantConfig(num_bits=8, pcq_a=True)
    out, _ = quantize_activation(x, cfg)
    min_c = x.min(axis=(0, 1, 2))
    max_c = x.max(axis=(0, 1, 2))
    want = np.asarray(qm.fake_quant(x, max_c - min_c, min_c, 255.0, channel_axis=-1))
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)


def test_pcq_a_skips_1x1_spatial():
    rng = np.random.RandomState(3)
    x = rng.randn(4, 1, 1, 8).astype(np.float32)
    cfg = QuantConfig(num_bits=8, pcq_a=True)
    out, _ = quantize_activation(x, cfg, tag='activation')
    mins = x.reshape(4, -1).min(axis=1).mean()
    maxs = x.reshape(4, -1).max(axis=1).mean()
    want = np.asarray(qm.fake_quant(x, maxs - mins, mins, 255.0))
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)


def test_half_range_zeroes_min():
    rng = np.random.RandomState(4)
    x = np.abs(rng.randn(2, 5, 5, 4)).astype(np.float32)
    cfg = QuantConfig(num_bits=8, pcq_a=True)
    out, _ = quantize_activation(x, cfg, half_range=True)
    max_c = x.max(axis=(0, 1, 2))
    want = np.asarray(qm.fake_quant(x, max_c, np.zeros(4, np.float32), 255.0, channel_axis=-1))
    np.testing.assert_allclose(np.asarray(out), want, atol=1e-6)


def test_laplace_clipping_beats_minmax_on_heavy_tails():
    rng = np.random.RandomState(5)
    x = rng.laplace(0, 1.0, size=(8, 16, 16, 4)).astype(np.float32)
    naive, _ = quantize_activation(x, QuantConfig(num_bits=4, pcq_a=True))
    aciq, _ = quantize_activation(x, QuantConfig(num_bits=4, pcq_a=True, clipping='laplace'))
    mse_naive = float(jnp.mean((jnp.asarray(x) - naive) ** 2))
    mse_aciq = float(jnp.mean((jnp.asarray(x) - aciq) ** 2))
    assert mse_aciq < mse_naive


def test_bit_alloc_engages_at_4_bits():
    rng = np.random.RandomState(6)
    scalec = np.array([0.1, 0.1, 10.0, 10.0], np.float32)
    x = rng.randn(2, 8, 8, 4).astype(np.float32) * scalec
    cfg = QuantConfig(num_bits=4, pcq_a=True, bit_alloc_act=True)
    out, _ = quantize_activation(x, cfg)
    # high-variance channels must get more distinct levels than low-variance ones
    uniq = [np.unique(np.asarray(out[..., c])).size for c in range(4)]
    assert uniq[2] > uniq[0] and uniq[3] > uniq[1]


def test_site_stats_override_tensor_stats():
    x = np.full((2, 4, 4, 2), 5.0, np.float32)
    stats = {'mean_min': np.zeros(2, np.float32), 'mean_max': np.full(2, 10.0, np.float32)}
    cfg = QuantConfig(num_bits=8, pcq_a=True)
    out, _ = quantize_activation(x, cfg, site_stats=stats)
    # with stats range [0,10] the value 5.0 sits exactly between grid points
    # 127 and 128 (127.5 * scale); either rounding is valid (reciprocal-mult
    # fusion can land on either side), but it must be one of the two and far
    # from what tensor-derived stats (range [5,5]) would give (exactly 5.0
    # with scale 1e-8... i.e. the degenerate grid)
    scale = 10.0 / 255.0
    got = np.unique(np.asarray(out))
    assert got.size == 1
    assert min(abs(got[0] - 127 * scale), abs(got[0] - 128 * scale)) < 1e-5, got


def test_kld_path_uses_threshold():
    x = np.linspace(-10, 10, 1000, dtype=np.float32).reshape(1, -1)
    stats = {'mean_kld_th': np.float32(2.0), 'mean_min': np.float32(-10.0),
             'mean_max': np.float32(10.0), 'mean_mean': np.float32(0.0)}
    cfg = QuantConfig(num_bits=8, kld=True)
    out, _ = quantize_activation(x, cfg, site_stats=stats)
    # clipped at mean +/- alpha => values saturate near +/- 2
    assert float(jnp.max(out)) < 2.1 and float(jnp.min(out)) > -2.1


def test_weight_pcq():
    rng = np.random.RandomState(7)
    w = rng.randn(3, 3, 8, 16).astype(np.float32)
    cfg = QuantConfig(num_bits=8, pcq_w=True)
    wq, _ = quantize_weight(w, cfg, out_axis=-1)
    ref = w.transpose(3, 0, 1, 2).reshape(16, -1)
    min_c, max_c = ref.min(axis=1), ref.max(axis=1)
    want = np.asarray(qm.fake_quant(w, max_c - min_c, min_c, 255.0, channel_axis=-1))
    np.testing.assert_allclose(np.asarray(wq), want, atol=1e-6)


def test_weight_per_tensor_fallthrough():
    rng = np.random.RandomState(8)
    w = rng.randn(4, 4).astype(np.float32)
    cfg = QuantConfig(num_bits=8, pcq_w=False)
    wq, _ = quantize_weight(w, cfg)
    want = np.asarray(qm.fake_quant(w, w.max() - w.min(), w.min(), 255.0))
    np.testing.assert_allclose(np.asarray(wq), want, atol=1e-6)


def test_weight_bit_alloc():
    rng = np.random.RandomState(9)
    w = rng.randn(3, 3, 4, 8).astype(np.float32) * np.linspace(0.1, 5, 8, dtype=np.float32)
    cfg = QuantConfig(num_bits=4, pcq_w=True, bit_alloc_weight=True)
    wq, _ = quantize_weight(w, cfg, out_axis=-1)
    uniq = [np.unique(np.asarray(wq[..., c])).size for c in range(8)]
    assert uniq[-1] > uniq[0]


def test_whole_dispatch_is_jittable():
    cfg = QuantConfig(num_bits=4, pcq_a=True, clipping='laplace', bit_alloc_act=True)
    f = jax.jit(lambda t: quantize_activation(t, cfg, half_range=True)[0])
    x = jnp.abs(jnp.sin(jnp.arange(2 * 6 * 6 * 8, dtype=jnp.float32))).reshape(2, 6, 6, 8)
    out = f(x)
    assert out.shape == x.shape
    assert np.all(np.isfinite(np.asarray(out)))


def test_entropy_measurement():
    rng = np.random.RandomState(10)
    x = rng.randn(2, 6, 6, 4).astype(np.float32)
    cfg = QuantConfig(num_bits=4, pcq_a=True, measure_entropy=True)
    out, aux = quantize_activation(x, cfg)
    assert 'entropy' in aux
    assert 0.0 < float(aux['entropy']) <= 4.0


def test_mid_tread_path():
    rng = np.random.RandomState(11)
    x = rng.randn(2, 6, 6, 4).astype(np.float32)
    cfg = QuantConfig(num_bits=4, pcq_a=True, clipping='laplace', mtd_quant=True,
                      bit_alloc_target_act=5.3, measure_entropy=True)
    out, aux = quantize_activation(x, cfg)
    assert out.shape == x.shape
    assert 'entropy' in aux
    # mid-tread grid must contain 0 exactly
    assert 0.0 in np.asarray(out)
