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


def _torch_bottleneck_resnet(depths, groups, base_width):
    """Minimal torchvision-compatible Bottleneck ResNet (same state_dict
    keys: conv1/bn1/layerX.Y.{conv,bn}{1,2,3}/downsample.{0,1}/fc)."""
    tnn = torch.nn

    class Bottleneck(tnn.Module):
        def __init__(self, inplanes, planes, stride, downsample):
            super().__init__()
            width = int(planes * (base_width / 64.0)) * groups
            self.conv1 = tnn.Conv2d(inplanes, width, 1, bias=False)
            self.bn1 = tnn.BatchNorm2d(width)
            self.conv2 = tnn.Conv2d(width, width, 3, stride, 1,
                                    groups=groups, bias=False)
            self.bn2 = tnn.BatchNorm2d(width)
            self.conv3 = tnn.Conv2d(width, planes * 4, 1, bias=False)
            self.bn3 = tnn.BatchNorm2d(planes * 4)
            self.relu = tnn.ReLU(inplace=True)
            self.downsample = downsample

        def forward(self, x):
            idt = x if self.downsample is None else self.downsample(x)
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            return self.relu(out + idt)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.inplanes = 64
            self.conv1 = tnn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = tnn.BatchNorm2d(64)
            self.relu = tnn.ReLU(inplace=True)
            self.maxpool = tnn.MaxPool2d(3, 2, 1)
            for li, d in enumerate(depths):
                planes, stride = 64 * 2 ** li, (1 if li == 0 else 2)
                blocks = []
                for b in range(d):
                    st = stride if b == 0 else 1
                    ds = None
                    if b == 0 and (st != 1 or self.inplanes != planes * 4):
                        ds = tnn.Sequential(
                            tnn.Conv2d(self.inplanes, planes * 4, 1, st, bias=False),
                            tnn.BatchNorm2d(planes * 4))
                    blocks.append(Bottleneck(self.inplanes, planes, st, ds))
                    self.inplanes = planes * 4
                setattr(self, f'layer{li + 1}', tnn.Sequential(*blocks))
            self.avgpool = tnn.AdaptiveAvgPool2d((1, 1))
            self.fc = tnn.Linear(512 * 4, 1000)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            for li in range(len(depths)):
                x = getattr(self, f'layer{li + 1}')(x)
            return self.fc(self.avgpool(x).flatten(1))

    return Net()


@pytest.mark.parametrize('arch,groups,base_width',
                         [('resnext50_32x4d', 32, 4),
                          ('wide_resnet50_2', 1, 128)])
def test_resnext_wide_resnet_match_torch(arch, groups, base_width):
    """Grouped-conv / wide bottleneck parity: random-weight torch model vs
    our converted Flax model must agree on logits.

    Reference gating (inference_sim.py:175-182): 'resnet' in arch -> BN fold
    + before-relu marking, so wide_resnet* folds and resnext* does not.
    """
    from cnn_quantization_tpu.models import build_model
    from cnn_quantization_tpu.engine import TapContext
    from cnn_quantization_tpu.utils.torch_import import import_arch

    torch.manual_seed(0)
    tm = _torch_bottleneck_resnet((3, 4, 6, 3), groups, base_width).eval()
    # non-trivial BN running stats so folding is actually exercised
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 2.0)

    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        want = tm(x).numpy()

    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    model, meta = build_model(arch)
    assert meta.fold_bn == (arch == 'wide_resnet50_2')
    params = import_arch(arch, state, fold_bn=meta.fold_bn)
    got = model.apply({'params': params},
                      jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), TapContext())
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-4)


def _torch_densenet(growth=32, blocks=(6, 12, 24, 16), init_feat=64, bn_size=4):
    """Minimal torchvision-compatible DenseNet (same state_dict keys)."""
    tnn = torch.nn
    from collections import OrderedDict

    class DenseLayer(tnn.Module):
        def __init__(self, in_ch):
            super().__init__()
            self.norm1 = tnn.BatchNorm2d(in_ch)
            self.relu1 = tnn.ReLU(inplace=True)
            self.conv1 = tnn.Conv2d(in_ch, bn_size * growth, 1, bias=False)
            self.norm2 = tnn.BatchNorm2d(bn_size * growth)
            self.relu2 = tnn.ReLU(inplace=True)
            self.conv2 = tnn.Conv2d(bn_size * growth, growth, 3, padding=1, bias=False)

        def forward(self, x):
            return self.conv2(self.relu2(self.norm2(
                self.conv1(self.relu1(self.norm1(x))))))

    class DenseBlock(tnn.Module):
        def __init__(self, n, in_ch):
            super().__init__()
            for j in range(n):
                self.add_module(f'denselayer{j + 1}', DenseLayer(in_ch + j * growth))

        def forward(self, x):
            for layer in self.children():
                x = torch.cat([x, layer(x)], 1)
            return x

    class Transition(tnn.Module):
        def __init__(self, in_ch, out_ch):
            super().__init__()
            self.norm = tnn.BatchNorm2d(in_ch)
            self.relu = tnn.ReLU(inplace=True)
            self.conv = tnn.Conv2d(in_ch, out_ch, 1, bias=False)
            self.pool = tnn.AvgPool2d(2, 2)

        def forward(self, x):
            return self.pool(self.conv(self.relu(self.norm(x))))

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            feats = OrderedDict([
                ('conv0', tnn.Conv2d(3, init_feat, 7, 2, 3, bias=False)),
                ('norm0', tnn.BatchNorm2d(init_feat)),
                ('relu0', tnn.ReLU(inplace=True)),
                ('pool0', tnn.MaxPool2d(3, 2, 1))])
            ch = init_feat
            for i, n in enumerate(blocks):
                feats[f'denseblock{i + 1}'] = DenseBlock(n, ch)
                ch += n * growth
                if i != len(blocks) - 1:
                    feats[f'transition{i + 1}'] = Transition(ch, ch // 2)
                    ch //= 2
            feats['norm5'] = tnn.BatchNorm2d(ch)
            self.features = tnn.Sequential(feats)
            self.classifier = tnn.Linear(ch, 1000)

        def forward(self, x):
            h = torch.relu(self.features(x))
            return self.classifier(torch.mean(h, dim=(2, 3)))

    return Net()


def test_densenet121_matches_torch():
    """DenseNet pre-activation/concat parity: random-weight torch model vs
    converted Flax model (no BN folding: densenet is never folded —
    inference_sim.py:179-182)."""
    from cnn_quantization_tpu.models import build_model
    from cnn_quantization_tpu.engine import TapContext
    from cnn_quantization_tpu.utils.torch_import import import_arch

    torch.manual_seed(0)
    tm = _torch_densenet().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 2.0)
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        want = tm(x).numpy()
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    model, meta = build_model('densenet121')
    assert not meta.fold_bn
    params = import_arch('densenet121', state, fold_bn=False)
    got = model.apply({'params': params},
                      jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), TapContext())
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-4)


def _torch_googlenet():
    """Minimal torchvision-compatible GoogLeNet (eval path, no aux)."""
    tnn = torch.nn

    class BasicConv2d(tnn.Module):
        def __init__(self, cin, cout, **kw):
            super().__init__()
            self.conv = tnn.Conv2d(cin, cout, bias=False, **kw)
            self.bn = tnn.BatchNorm2d(cout, eps=1e-3)

        def forward(self, x):
            return torch.relu(self.bn(self.conv(x)))

    class Inception(tnn.Module):
        def __init__(self, cin, c1, c3r, c3, c5r, c5, pp):
            super().__init__()
            self.branch1 = BasicConv2d(cin, c1, kernel_size=1)
            self.branch2 = tnn.Sequential(
                BasicConv2d(cin, c3r, kernel_size=1),
                BasicConv2d(c3r, c3, kernel_size=3, padding=1))
            self.branch3 = tnn.Sequential(
                BasicConv2d(cin, c5r, kernel_size=1),
                BasicConv2d(c5r, c5, kernel_size=3, padding=1))
            self.branch4 = tnn.Sequential(
                tnn.MaxPool2d(3, stride=1, padding=1, ceil_mode=True),
                BasicConv2d(cin, pp, kernel_size=1))

        def forward(self, x):
            return torch.cat([self.branch1(x), self.branch2(x),
                              self.branch3(x), self.branch4(x)], 1)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = BasicConv2d(3, 64, kernel_size=7, stride=2, padding=3)
            self.maxpool1 = tnn.MaxPool2d(3, 2, ceil_mode=True)
            self.conv2 = BasicConv2d(64, 64, kernel_size=1)
            self.conv3 = BasicConv2d(64, 192, kernel_size=3, padding=1)
            self.maxpool2 = tnn.MaxPool2d(3, 2, ceil_mode=True)
            self.inception3a = Inception(192, 64, 96, 128, 16, 32, 32)
            self.inception3b = Inception(256, 128, 128, 192, 32, 96, 64)
            self.maxpool3 = tnn.MaxPool2d(3, 2, ceil_mode=True)
            self.inception4a = Inception(480, 192, 96, 208, 16, 48, 64)
            self.inception4b = Inception(512, 160, 112, 224, 24, 64, 64)
            self.inception4c = Inception(512, 128, 128, 256, 24, 64, 64)
            self.inception4d = Inception(512, 112, 144, 288, 32, 64, 64)
            self.inception4e = Inception(528, 256, 160, 320, 32, 128, 128)
            self.maxpool4 = tnn.MaxPool2d(2, 2, ceil_mode=True)
            self.inception5a = Inception(832, 256, 160, 320, 32, 128, 128)
            self.inception5b = Inception(832, 384, 192, 384, 48, 128, 128)
            self.fc = tnn.Linear(1024, 1000)

        def forward(self, x):
            # torchvision transform_input (pretrained googlenet)
            x0 = x[:, 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
            x1 = x[:, 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
            x2 = x[:, 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
            x = torch.cat([x0, x1, x2], 1)
            x = self.maxpool1(self.conv1(x))
            x = self.maxpool2(self.conv3(self.conv2(x)))
            x = self.maxpool3(self.inception3b(self.inception3a(x)))
            x = self.inception4e(self.inception4d(self.inception4c(
                self.inception4b(self.inception4a(x)))))
            x = self.maxpool4(x)
            x = self.inception5b(self.inception5a(x))
            return self.fc(torch.mean(x, dim=(2, 3)))

    return Net()


def test_googlenet_matches_torch():
    from cnn_quantization_tpu.models import build_model
    from cnn_quantization_tpu.engine import TapContext
    from cnn_quantization_tpu.utils.torch_import import import_arch

    torch.manual_seed(0)
    tm = _torch_googlenet().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 2.0)
    x = torch.randn(2, 3, 96, 96)
    with torch.no_grad():
        want = tm(x).numpy()
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    model, meta = build_model('googlenet')
    assert not meta.fold_bn
    params = import_arch('googlenet', state, fold_bn=False)
    got = model.apply({'params': params},
                      jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), TapContext())
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-4)


def _torch_inception3():
    """Minimal torchvision-compatible Inception-v3 (eval path, no aux)."""
    import torch.nn.functional as F
    tnn = torch.nn

    class BasicConv2d(tnn.Module):
        def __init__(self, cin, cout, **kw):
            super().__init__()
            self.conv = tnn.Conv2d(cin, cout, bias=False, **kw)
            self.bn = tnn.BatchNorm2d(cout, eps=1e-3)

        def forward(self, x):
            return torch.relu(self.bn(self.conv(x)))

    class InceptionA(tnn.Module):
        def __init__(self, cin, pool_features):
            super().__init__()
            self.branch1x1 = BasicConv2d(cin, 64, kernel_size=1)
            self.branch5x5_1 = BasicConv2d(cin, 48, kernel_size=1)
            self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
            self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
            self.branch_pool = BasicConv2d(cin, pool_features, kernel_size=1)

        def forward(self, x):
            return torch.cat([
                self.branch1x1(x),
                self.branch5x5_2(self.branch5x5_1(x)),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))], 1)

    class InceptionB(tnn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3 = BasicConv2d(cin, 384, kernel_size=3, stride=2)
            self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

        def forward(self, x):
            return torch.cat([
                self.branch3x3(x),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                F.max_pool2d(x, 3, stride=2)], 1)

    class InceptionC(tnn.Module):
        def __init__(self, cin, c7):
            super().__init__()
            self.branch1x1 = BasicConv2d(cin, 192, kernel_size=1)
            self.branch7x7_1 = BasicConv2d(cin, c7, kernel_size=1)
            self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_1 = BasicConv2d(cin, c7, kernel_size=1)
            self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
            self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

        def forward(self, x):
            b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
            bd = self.branch7x7dbl_5(self.branch7x7dbl_4(self.branch7x7dbl_3(
                self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
            return torch.cat([
                self.branch1x1(x), b7, bd,
                self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))], 1)

    class InceptionD(tnn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3_1 = BasicConv2d(cin, 192, kernel_size=1)
            self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
            self.branch7x7x3_1 = BasicConv2d(cin, 192, kernel_size=1)
            self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

        def forward(self, x):
            return torch.cat([
                self.branch3x3_2(self.branch3x3_1(x)),
                self.branch7x7x3_4(self.branch7x7x3_3(self.branch7x7x3_2(
                    self.branch7x7x3_1(x)))),
                F.max_pool2d(x, 3, stride=2)], 1)

    class InceptionE(tnn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch1x1 = BasicConv2d(cin, 320, kernel_size=1)
            self.branch3x3_1 = BasicConv2d(cin, 384, kernel_size=1)
            self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
            self.branch3x3dbl_1 = BasicConv2d(cin, 448, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
            self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
            self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

        def forward(self, x):
            y = self.branch3x3_1(x)
            z = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
            return torch.cat([
                self.branch1x1(x),
                torch.cat([self.branch3x3_2a(y), self.branch3x3_2b(y)], 1),
                torch.cat([self.branch3x3dbl_3a(z), self.branch3x3dbl_3b(z)], 1),
                self.branch_pool(F.avg_pool2d(x, 3, stride=1, padding=1))], 1)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
            self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
            self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
            self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
            self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
            self.Mixed_5b = InceptionA(192, pool_features=32)
            self.Mixed_5c = InceptionA(256, pool_features=64)
            self.Mixed_5d = InceptionA(288, pool_features=64)
            self.Mixed_6a = InceptionB(288)
            self.Mixed_6b = InceptionC(768, c7=128)
            self.Mixed_6c = InceptionC(768, c7=160)
            self.Mixed_6d = InceptionC(768, c7=160)
            self.Mixed_6e = InceptionC(768, c7=192)
            self.Mixed_7a = InceptionD(768)
            self.Mixed_7b = InceptionE(1280)
            self.Mixed_7c = InceptionE(2048)
            self.fc = tnn.Linear(2048, 1000)

        def forward(self, x):
            import torch.nn.functional as F
            x0 = x[:, 0:1] * (0.229 / 0.5) + (0.485 - 0.5) / 0.5
            x1 = x[:, 1:2] * (0.224 / 0.5) + (0.456 - 0.5) / 0.5
            x2 = x[:, 2:3] * (0.225 / 0.5) + (0.406 - 0.5) / 0.5
            x = torch.cat([x0, x1, x2], 1)
            x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
            x = F.max_pool2d(x, 3, stride=2)
            x = self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x))
            x = F.max_pool2d(x, 3, stride=2)
            x = self.Mixed_5d(self.Mixed_5c(self.Mixed_5b(x)))
            x = self.Mixed_6a(x)
            x = self.Mixed_6e(self.Mixed_6d(self.Mixed_6c(self.Mixed_6b(x))))
            x = self.Mixed_7c(self.Mixed_7b(self.Mixed_7a(x)))
            x = F.adaptive_avg_pool2d(x, (1, 1))
            return self.fc(torch.flatten(x, 1))

    return Net()


def test_inception_v3_matches_torch():
    """Inception-v3 forward parity vs a torchvision-compatible twin, with
    the reference's BN-folding applied at import (inception_v3 IS folded —
    inference_sim.py:179-182); closes the only model family that lacked a
    torch ground-truth forward test."""
    from cnn_quantization_tpu.models import build_model
    from cnn_quantization_tpu.engine import TapContext
    from cnn_quantization_tpu.utils.torch_import import import_arch

    torch.manual_seed(0)
    tm = _torch_inception3().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 2.0)
    x = torch.randn(2, 3, 128, 128)
    with torch.no_grad():
        want = tm(x).numpy()
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    model, meta = build_model('inception_v3')
    assert meta.fold_bn
    params = import_arch('inception_v3', state, fold_bn=True)
    got = model.apply({'params': params},
                      jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), TapContext())
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-4)


def _torch_mobilenet_v2():
    """Minimal torchvision-compatible MobileNetV2 (state-dict names match
    torchvision: features.N..., classifier.1)."""
    tnn = torch.nn

    class ConvBNReLU(tnn.Sequential):
        def __init__(self, cin, cout, kernel_size=3, stride=1, groups=1):
            pad = (kernel_size - 1) // 2
            super().__init__(
                tnn.Conv2d(cin, cout, kernel_size, stride, pad, groups=groups,
                           bias=False),
                tnn.BatchNorm2d(cout),
                tnn.ReLU6(inplace=False))

    class InvertedResidual(tnn.Module):
        def __init__(self, cin, cout, stride, expand_ratio):
            super().__init__()
            self.stride = stride
            hidden = int(round(cin * expand_ratio))
            self.use_res_connect = stride == 1 and cin == cout
            layers = []
            if expand_ratio != 1:
                layers.append(ConvBNReLU(cin, hidden, kernel_size=1))
            layers.extend([
                ConvBNReLU(hidden, hidden, stride=stride, groups=hidden),
                tnn.Conv2d(hidden, cout, 1, 1, 0, bias=False),
                tnn.BatchNorm2d(cout)])
            self.conv = tnn.Sequential(*layers)

        def forward(self, x):
            return x + self.conv(x) if self.use_res_connect else self.conv(x)

    class Net(tnn.Module):
        def __init__(self, num_classes=1000):
            super().__init__()
            cfg = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2),
                   (6, 64, 4, 2), (6, 96, 3, 1), (6, 160, 3, 2),
                   (6, 320, 1, 1)]
            features = [ConvBNReLU(3, 32, stride=2)]
            cin = 32
            for t, c, n, s in cfg:
                for i in range(n):
                    features.append(InvertedResidual(
                        cin, c, s if i == 0 else 1, t))
                    cin = c
            features.append(ConvBNReLU(cin, 1280, kernel_size=1))
            self.features = tnn.Sequential(*features)
            self.classifier = tnn.Sequential(
                tnn.Dropout(0.2), tnn.Linear(1280, num_classes))

        def forward(self, x):
            x = self.features(x)
            x = x.mean([2, 3])
            return self.classifier(x)

    return Net()


def test_mobilenet_v2_matches_torch():
    """MobileNet-v2 forward parity vs a torchvision-compatible twin under
    the reference's PARTIAL BN fold (groups==1 convs fold, depthwise BNs
    stay live — absorb_bn.py:31): the strongest depthwise/import stress in
    the zoo."""
    from cnn_quantization_tpu.models import build_model
    from cnn_quantization_tpu.engine import TapContext
    from cnn_quantization_tpu.utils.torch_import import import_arch

    torch.manual_seed(0)
    tm = _torch_mobilenet_v2().eval()
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 2.0)
    x = torch.randn(2, 3, 96, 96)
    with torch.no_grad():
        want = tm(x).numpy()
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    model, meta = build_model('mobilenet_v2')
    params = import_arch('mobilenet_v2', state, fold_bn=meta.fold_bn)
    got = model.apply({'params': params},
                      jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), TapContext())
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-4)


def _randomize_bn(tm):
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.BatchNorm2d):
                m.running_mean.uniform_(-0.2, 0.2)
                m.running_var.uniform_(0.5, 2.0)


def _match_torch(arch, tm, x, fold_bn):
    from cnn_quantization_tpu.models import build_model
    from cnn_quantization_tpu.engine import TapContext
    from cnn_quantization_tpu.utils.torch_import import import_arch
    tm = tm.eval()
    _randomize_bn(tm)
    with torch.no_grad():
        want = tm(x).numpy()
    state = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    model, meta = build_model(arch)
    assert meta.fold_bn == fold_bn
    params = import_arch(arch, state, fold_bn=fold_bn)
    got = model.apply({'params': params},
                      jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), TapContext())
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=2e-4)


def test_alexnet_matches_torch():
    """AlexNet forward parity vs the torchvision Sequential layout
    (features.0/3/6/8/10 convs, classifier.1/4/6 linears)."""
    tnn = torch.nn

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = tnn.Sequential(
                tnn.Conv2d(3, 64, 11, 4, 2), tnn.ReLU(),
                tnn.MaxPool2d(3, 2),
                tnn.Conv2d(64, 192, 5, padding=2), tnn.ReLU(),
                tnn.MaxPool2d(3, 2),
                tnn.Conv2d(192, 384, 3, padding=1), tnn.ReLU(),
                tnn.Conv2d(384, 256, 3, padding=1), tnn.ReLU(),
                tnn.Conv2d(256, 256, 3, padding=1), tnn.ReLU(),
                tnn.MaxPool2d(3, 2))
            self.classifier = tnn.Sequential(
                tnn.Dropout(), tnn.Linear(256 * 6 * 6, 4096), tnn.ReLU(),
                tnn.Dropout(), tnn.Linear(4096, 4096), tnn.ReLU(),
                tnn.Linear(4096, 1000))

        def forward(self, x):
            x = self.features(x)
            return self.classifier(torch.flatten(x, 1))

    torch.manual_seed(0)
    _match_torch('alexnet', Net(), torch.randn(2, 3, 224, 224), fold_bn=False)


def test_vgg16_bn_matches_torch():
    """VGG-16-bn forward parity with the reference's BN folding applied
    at import (vgg16_bn IS folded — inference_sim.py:179-182)."""
    tnn = torch.nn
    cfg = [64, 64, 'M', 128, 128, 'M', 256, 256, 256, 'M',
           512, 512, 512, 'M', 512, 512, 512, 'M']

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            layers = []
            cin = 3
            for v in cfg:
                if v == 'M':
                    layers.append(tnn.MaxPool2d(2, 2))
                else:
                    layers += [tnn.Conv2d(cin, v, 3, padding=1),
                               tnn.BatchNorm2d(v), tnn.ReLU()]
                    cin = v
            self.features = tnn.Sequential(*layers)
            self.classifier = tnn.Sequential(
                tnn.Linear(512 * 7 * 7, 4096), tnn.ReLU(), tnn.Dropout(),
                tnn.Linear(4096, 4096), tnn.ReLU(), tnn.Dropout(),
                tnn.Linear(4096, 1000))

        def forward(self, x):
            x = self.features(x)
            return self.classifier(torch.flatten(x, 1))

    torch.manual_seed(0)
    _match_torch('vgg16_bn', Net(), torch.randn(1, 3, 224, 224), fold_bn=True)


def test_squeezenet1_0_matches_torch():
    """SqueezeNet-1.0 forward parity: Fire modules (squeeze/expand1x1/
    expand3x3), ceil-mode maxpools, conv classifier + global pool."""
    tnn = torch.nn

    class Fire(tnn.Module):
        def __init__(self, cin, s, e1, e3):
            super().__init__()
            self.squeeze = tnn.Conv2d(cin, s, 1)
            self.expand1x1 = tnn.Conv2d(s, e1, 1)
            self.expand3x3 = tnn.Conv2d(s, e3, 3, padding=1)

        def forward(self, x):
            x = torch.relu(self.squeeze(x))
            return torch.cat([torch.relu(self.expand1x1(x)),
                              torch.relu(self.expand3x3(x))], 1)

    class Net(tnn.Module):
        def __init__(self):
            super().__init__()
            self.features = tnn.Sequential(
                tnn.Conv2d(3, 96, 7, 2), tnn.ReLU(),
                tnn.MaxPool2d(3, 2, ceil_mode=True),
                Fire(96, 16, 64, 64), Fire(128, 16, 64, 64),
                Fire(128, 32, 128, 128),
                tnn.MaxPool2d(3, 2, ceil_mode=True),
                Fire(256, 32, 128, 128), Fire(256, 48, 192, 192),
                Fire(384, 48, 192, 192), Fire(384, 64, 256, 256),
                tnn.MaxPool2d(3, 2, ceil_mode=True),
                Fire(512, 64, 256, 256))
            self.classifier = tnn.Sequential(
                tnn.Dropout(), tnn.Conv2d(512, 1000, 1), tnn.ReLU(),
                tnn.AdaptiveAvgPool2d((1, 1)))

        def forward(self, x):
            x = self.classifier(self.features(x))
            return torch.flatten(x, 1)

    torch.manual_seed(0)
    _match_torch('squeezenet1_0', Net(), torch.randn(2, 3, 224, 224),
                 fold_bn=False)
