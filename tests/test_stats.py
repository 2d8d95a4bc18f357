import numpy as np

from cnn_quantization_tpu.ops import stats


def test_per_tensor_global():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 8, 8, 3).astype(np.float32)
    s = stats.act_stats(x, ['min', 'max', 'mean', 'std', 'b', 'mean_abs', 'kurtosis'])
    flat = x.reshape(-1).astype(np.float64)
    np.testing.assert_allclose(s['min'], flat.min(), rtol=1e-6)
    np.testing.assert_allclose(s['max'], flat.max(), rtol=1e-6)
    np.testing.assert_allclose(s['mean'], flat.mean(), atol=1e-6)
    np.testing.assert_allclose(s['std'], flat.std(ddof=1), rtol=1e-5)
    np.testing.assert_allclose(s['b'], np.abs(flat - flat.mean()).mean(), rtol=1e-5)
    np.testing.assert_allclose(s['mean_abs'], np.abs(flat).mean(), rtol=1e-5)
    kurt = ((flat - flat.mean()) / flat.std(ddof=1)) ** 4
    np.testing.assert_allclose(s['kurtosis'], kurt.mean() - 3, rtol=1e-4, atol=1e-5)


def test_per_tensor_avg_over_batch():
    rng = np.random.RandomState(1)
    x = rng.randn(8, 10).astype(np.float32)
    s = stats.act_stats(x, ['min', 'max'], avg_over_batch=True)
    np.testing.assert_allclose(s['min'], x.min(axis=1).mean(), rtol=1e-6)
    np.testing.assert_allclose(s['max'], x.max(axis=1).mean(), rtol=1e-6)


def test_per_channel_nhwc_equals_reference_layout():
    rng = np.random.RandomState(2)
    nhwc = rng.randn(4, 5, 6, 7).astype(np.float32)
    s = stats.act_stats_per_channel(nhwc, ['min', 'max', 'mean', 'std', 'b', 'std_pos'],
                                    channel_axis=-1)
    # reference computes on [C, N*H*W]
    ref = nhwc.transpose(3, 0, 1, 2).reshape(7, -1).astype(np.float64)
    np.testing.assert_allclose(s['min'], ref.min(axis=1), rtol=1e-6)
    np.testing.assert_allclose(s['max'], ref.max(axis=1), rtol=1e-6)
    np.testing.assert_allclose(s['mean'], ref.mean(axis=1), atol=1e-6)
    np.testing.assert_allclose(s['std'], ref.std(axis=1, ddof=1), rtol=1e-5)
    np.testing.assert_allclose(s['b'], np.abs(ref - ref.mean(axis=1, keepdims=True)).mean(axis=1), rtol=1e-5)
    np.testing.assert_allclose(s['std_pos'], np.maximum(ref, 0).std(axis=1, ddof=1), rtol=1e-5)


def test_per_channel_avg_over_batch():
    rng = np.random.RandomState(3)
    x = rng.randn(4, 5, 6, 7).astype(np.float32)
    s = stats.act_stats_per_channel(x, ['max'], channel_axis=-1, avg_over_batch=True)
    want = x.transpose(0, 3, 1, 2).reshape(4, 7, -1).max(axis=-1).mean(axis=0)
    np.testing.assert_allclose(s['max'], want, rtol=1e-6)


def test_weight_stats_hwio():
    rng = np.random.RandomState(4)
    w = rng.randn(3, 3, 16, 32).astype(np.float32)  # HWIO
    s = stats.weight_stats_per_channel(w, ['min', 'max', 'std'], out_axis=-1)
    ref = w.transpose(3, 0, 1, 2).reshape(32, -1)
    np.testing.assert_allclose(s['min'], ref.min(axis=1), rtol=1e-6)
    np.testing.assert_allclose(s['max'], ref.max(axis=1), rtol=1e-6)
    np.testing.assert_allclose(s['std'], ref.std(axis=1, ddof=1), rtol=1e-5)
