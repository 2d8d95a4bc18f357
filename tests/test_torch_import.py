"""Checkpoint conversion: BN folding algebra + layout permutations, verified
against torch (CPU) as ground truth."""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp
from jax import lax

from cnn_quantization_tpu.utils.torch_import import (fold_bn_state,
                                                     state_dict_to_params,
                                                     _flax_path)


def _state_dict_np(module):
    return {k: v.detach().numpy() for k, v in module.state_dict().items()}


def test_bn_fold_matches_torch():
    tnn = torch.nn
    torch.manual_seed(0)
    m = tnn.Sequential(tnn.Conv2d(4, 8, 3, padding=1), tnn.BatchNorm2d(8))
    m.eval()
    # give BN non-trivial running stats
    with torch.no_grad():
        m[1].running_mean.uniform_(-1, 1)
        m[1].running_var.uniform_(0.5, 2)
        m[1].weight.uniform_(0.5, 1.5)
        m[1].bias.uniform_(-0.5, 0.5)
    x = torch.randn(2, 4, 6, 6)
    with torch.no_grad():
        want = m(x).numpy()

    state, folded = fold_bn_state(_state_dict_np(m))
    assert folded == ['1']
    assert '1.running_mean' not in state
    # run the folded conv in jax (NHWC/HWIO)
    w = jnp.asarray(np.transpose(state['0.weight'], (2, 3, 1, 0)))
    b = jnp.asarray(state['0.bias'])
    got = lax.conv_general_dilated(
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), w, (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=('NHWC', 'HWIO', 'NHWC')) + b
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-4, atol=1e-5)


def test_depthwise_bn_not_folded():
    tnn = torch.nn
    m = tnn.Sequential(tnn.Conv2d(8, 8, 3, groups=8, bias=False),
                       tnn.BatchNorm2d(8))
    state, folded = fold_bn_state(_state_dict_np(m))
    assert folded == []
    assert '1.running_mean' in state


def test_flax_path_merging():
    assert _flax_path('layer1.0.downsample.1') == ('layer1_0', 'downsample_1')
    assert _flax_path('features.0') == ('features_0',)
    assert _flax_path('Mixed_5b.branch1x1.conv') == ('Mixed_5b', 'branch1x1', 'conv')
    assert _flax_path('features.1.conv.0.0') == ('features_1', 'conv_0_0')


def test_linear_conversion_and_flatten_permutation():
    tnn = torch.nn
    torch.manual_seed(1)

    class Tiny(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv = tnn.Conv2d(3, 4, 3, padding=1)
            self.fc = tnn.Linear(4 * 5 * 5, 7)

        def forward(self, x):
            h = self.conv(x)
            return self.fc(h.flatten(1))

    m = Tiny().eval()
    x = torch.randn(2, 3, 5, 5)
    with torch.no_grad():
        want = m(x).numpy()

    params = state_dict_to_params(_state_dict_np(m), fold_bn=False,
                                  flatten_inputs={'fc': (4, 5, 5)})
    xx = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    h = lax.conv_general_dilated(xx, jnp.asarray(params['conv']['kernel']),
                                 (1, 1), ((1, 1), (1, 1)),
                                 dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
    h = h + jnp.asarray(params['conv']['bias'])
    got = h.reshape(2, -1) @ jnp.asarray(params['fc']['kernel']) \
        + jnp.asarray(params['fc']['bias'])
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_resnet18_synthetic_checkpoint_roundtrip():
    """Build a torch-key-shaped state dict for resnet18, convert, apply."""
    from cnn_quantization_tpu.models import build_model
    from cnn_quantization_tpu.engine import TapContext
    from cnn_quantization_tpu.utils.torch_import import import_arch

    rng = np.random.RandomState(0)

    def conv_keys(prefix, cin, cout, k):
        return {f'{prefix}.weight': rng.randn(cout, cin, k, k).astype(np.float32) * 0.05}

    def bn_keys(prefix, c):
        return {f'{prefix}.weight': rng.rand(c).astype(np.float32) + 0.5,
                f'{prefix}.bias': rng.randn(c).astype(np.float32) * 0.1,
                f'{prefix}.running_mean': rng.randn(c).astype(np.float32) * 0.1,
                f'{prefix}.running_var': rng.rand(c).astype(np.float32) + 0.5}

    state = {}
    state.update(conv_keys('conv1', 3, 64, 7))
    state.update(bn_keys('bn1', 64))
    cfg = [(64, 64, 2, False), (64, 128, 2, True), (128, 256, 2, True), (256, 512, 2, True)]
    for li, (cin, cout, blocks, ds) in enumerate(cfg, start=1):
        for b in range(blocks):
            p = f'layer{li}.{b}'
            bin_ = cin if b == 0 else cout
            state.update(conv_keys(f'{p}.conv1', bin_, cout, 3))
            state.update(bn_keys(f'{p}.bn1', cout))
            state.update(conv_keys(f'{p}.conv2', cout, cout, 3))
            state.update(bn_keys(f'{p}.bn2', cout))
            if b == 0 and ds:
                state.update(conv_keys(f'{p}.downsample.0', bin_, cout, 1))
                state.update(bn_keys(f'{p}.downsample.1', cout))
    state['fc.weight'] = rng.randn(1000, 512).astype(np.float32) * 0.05
    state['fc.bias'] = np.zeros(1000, np.float32)

    params = import_arch('resnet18', state, fold_bn=True)
    model, meta = build_model('resnet18')
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    out = model.apply({'params': params}, x, TapContext())
    assert out.shape == (2, 1000)
    assert np.all(np.isfinite(np.asarray(out)))
