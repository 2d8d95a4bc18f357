"""Native C++ KLD sweep vs the numpy oracle."""

import time

import numpy as np
import pytest

from cnn_quantization_tpu.calib.kld import kld_threshold
from cnn_quantization_tpu import native


@pytest.mark.skipif(not native.available(), reason='native lib not built')
def test_native_matches_numpy():
    rng = np.random.RandomState(0)
    for dist in (rng.laplace(0, 1, 20000), rng.normal(0, 2, 20000),
                 np.abs(rng.laplace(0, 1, 20000))):
        arr = dist.astype(np.float32)
        th_native = kld_threshold(arr, use_native=True)
        th_numpy = kld_threshold(arr, use_native=False)
        # same histogram granularity: thresholds agree to within one bin
        bin_w = 2 * max(abs(arr.min()), abs(arr.max())) / 2001
        assert abs(th_native - th_numpy) <= 2 * bin_w + 1e-6, (th_native, th_numpy)


@pytest.mark.skipif(not native.available(), reason='native lib not built')
def test_native_is_faster():
    rng = np.random.RandomState(1)
    arr = rng.laplace(0, 1, 100000).astype(np.float32)
    t0 = time.perf_counter(); kld_threshold(arr, use_native=True)
    t_native = time.perf_counter() - t0
    t0 = time.perf_counter(); kld_threshold(arr, use_native=False)
    t_numpy = time.perf_counter() - t0
    assert t_native < t_numpy, (t_native, t_numpy)


@pytest.mark.skipif(not native.available(), reason='native lib not built')
def test_batch_variant():
    rng = np.random.RandomState(2)
    arr = rng.laplace(0, 1, (4, 8000)).astype(np.float32)
    out = native.kld_threshold_batch_native(arr)
    assert out.shape == (4,)
    for i in range(4):
        single = native.kld_threshold_native(arr[i])
        assert abs(out[i] - single) < 1e-9


def test_threshold_is_sane_for_laplace():
    rng = np.random.RandomState(3)
    arr = rng.laplace(0, 1, 50000).astype(np.float32)
    th = kld_threshold(arr)
    # entropy calibration clips laplace tails well inside the max (~11b)
    assert 2.0 < th < 9.0, th
