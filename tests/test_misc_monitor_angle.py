"""Misc utils (#21), angle stats (#24), monitor (#26), preprocess (#28)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cnn_quantization_tpu.models import build_model
from cnn_quantization_tpu.engine import TapContext
from cnn_quantization_tpu.utils.misc import (
    cos_sim, onehot, sorted_nicely, set_global_seeds, JNP_DTYPES)


@pytest.fixture(scope='module')
def small_model():
    model, meta = build_model('resnet18')
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, TapContext())['params']
    return model, meta, params


def test_cos_sim_matches_definition():
    rng = np.random.RandomState(0)
    x = rng.randn(4, 16).astype(np.float32)
    y = rng.randn(4, 16).astype(np.float32)
    got = np.asarray(cos_sim(x, y))
    want = np.array([np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))
                     for a, b in zip(x, y)])
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # multi-dim reduction
    x4 = rng.randn(2, 3, 4, 5).astype(np.float32)
    got = np.asarray(cos_sim(x4, x4, dims=(-1, -2, -3)))
    np.testing.assert_allclose(got, np.ones(2), rtol=1e-5)


def test_onehot():
    idx = np.array([0, 2, 1])
    oh = np.asarray(onehot(idx, 3))
    np.testing.assert_array_equal(oh, np.eye(3, dtype=np.uint8)[idx])
    oh = np.asarray(onehot(idx, 3, ignore_index=2))
    assert oh[1].sum() == 0 and oh[0, 0] == 1


def test_sorted_nicely_and_seeds_and_dtypes():
    ids = ['conv10_activation', 'conv2_activation', 'conv1_activation']
    assert sorted_nicely(ids) == [
        'conv1_activation', 'conv2_activation', 'conv10_activation']
    key = set_global_seeds(7)
    assert key.shape == (2,) or key.dtype  # a usable PRNG key
    a = np.random.rand()
    set_global_seeds(7)
    assert np.random.rand() == a
    assert JNP_DTYPES['int8'] == np.int8


def test_angle_stats(tmp_path):
    from cnn_quantization_tpu.calib.angle_stats import (
        AngleStats, angle_matrix, load_angle_stats)
    rng = np.random.RandomState(1)
    acts = rng.randn(4, 8, 8, 3).astype(np.float32)
    m = np.asarray(angle_matrix(acts))
    # brute-force reference (the O(N^2) loop the reference runs)
    flat = acts.reshape(4, -1)
    for i in range(4):
        for j in range(4):
            if j > i:
                c = np.dot(flat[i], flat[j]) / (
                    np.linalg.norm(flat[i]) * np.linalg.norm(flat[j]))
                assert abs(m[i, j] - np.arccos(np.clip(c, -1, 1))) < 1e-4
            else:
                assert m[i, j] == 0.0

    st = AngleStats(str(tmp_path))
    st.update({'conv1_activation': acts}, targets=np.array([1, 2, 3, 4]))
    st.update({'conv1_activation': acts}, targets=np.array([5, 6, 7, 8]))
    path = st.save()
    loaded = load_angle_stats(path)
    assert loaded['conv1_activation'].shape == (8, 4)
    assert list(loaded['target']) == [1, 2, 3, 4, 5, 6, 7, 8]


def test_monitor(tmp_path, small_model):
    from cnn_quantization_tpu.utils.monitor import Monitor, monitor_forward

    model, meta, params = small_model

    class Eng:
        pass

    eng = Eng()
    eng.model = model
    obs = monitor_forward(eng, params, jnp.ones((2, 64, 64, 3), jnp.float32))
    assert 'conv1_activation' in obs and obs['conv1_activation'].ndim == 4

    mon = Monitor(str(tmp_path))
    mon.register_tensors(obs)
    p = mon.dump_tensors(0, 1)
    assert os.path.basename(p) == 'epoch_0_step_1.npz'
    with np.load(p) as d:
        assert 'conv1_activation' in d.files
    mon.register_operation('conv1', {
        'in_channels': 3, 'out_channels': 64, 'stride': 2,
        'weight': np.zeros((7, 7, 3, 64), np.float32),
        'output': obs['conv1_activation']})
    p = mon.dump_operations(0, 1)
    with np.load(p) as d:
        assert 'conv1|weight' in d.files and d['conv1|stride'] == 2


def test_preprocess_transforms():
    from cnn_quantization_tpu.data import preprocess as pp
    img = (np.random.RandomState(0).rand(40, 60, 3) * 255).astype(np.uint8)
    rng = np.random.default_rng(0)

    out = pp.scale_crop(32, 36)(img)
    assert out.shape == (32, 32, 3) and out.dtype == np.float32
    # normalization applied: inverse recovers [0,1] range
    inv = out * pp.IMAGENET_STATS['std'] + pp.IMAGENET_STATS['mean']
    assert inv.min() >= -0.01 and inv.max() <= 1.01

    assert pp.scale_random_crop(32, 36)(img, rng).shape == (32, 32, 3)
    assert pp.pad_random_crop(32, 40)(img, rng).shape == (32, 32, 3)
    assert pp.inception_preprocess(32, color=True)(img, rng).shape == (32, 32, 3)

    t = pp.get_transform('imagenet', augment=False)
    big = (np.random.RandomState(1).rand(300, 400, 3) * 255).astype(np.uint8)
    assert t(big).shape == (224, 224, 3)
    assert pp.get_transform('cifar10', augment=True)(img, rng).shape == (32, 32, 3)
    t = pp.get_transform('mnist', augment=False)
    gray = np.repeat((np.random.RandomState(2).rand(32, 32, 1) * 255
                      ).astype(np.uint8), 3, axis=2)
    assert t(gray).shape == (28, 28, 3)
    with pytest.raises(ValueError):
        pp.get_transform('nope')


def test_lighting_shifts_colors():
    from cnn_quantization_tpu.data import preprocess as pp
    a = np.full((8, 8, 3), 0.5, np.float32)
    out = pp.lighting(a, np.random.default_rng(3), alphastd=0.5)
    assert out.shape == a.shape and not np.allclose(out, a)
    # shift is constant per channel (pure color-space shift)
    assert np.allclose(out - a, (out - a)[0, 0], atol=1e-6)
