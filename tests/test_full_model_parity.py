"""Full-model differential parity vs the reference inference manager.

The op-level matrix (tests/test_reference_parity.py) proves the quantizer
math is near-bit-exact; this file proves the *composition* — tag
assignment, construction-order site numbering, half-range marking, BN-fold
+ weight-quantization ordering, first-layer/classifier 8-bit exceptions,
the int4 'conv0_activation' ignore list — against the reference code
itself: a torchvision-faithful ResNet-18 is built under the reference's
``QuantizationManagerInference`` (monkeypatched ``*WithId`` layers,
reference: pytorch_quantizer/quantization/inference/
inference_quantization_manager.py:352-393, 407-476, 518-533), and the same
weights flow through our Flax pipeline; logits must agree for the golden
configurations of the reference README (naive W4A4, headline
laplace+bitalloc+bcw, 2std, ACIQ layer-wise -sm use).

Tolerances: both sides compute identical quantization grids from float
tensors that differ only by conv-implementation rounding (torch CPU vs XLA
CPU, ~1e-6 relative); a handful of values sitting exactly on a rounding
boundary may snap to adjacent grid points, so logits agree to ~1e-3
relative — far below the one-grid-step scale of any site — and argmax
agrees exactly.
"""

import numpy as np
import pytest

torch = pytest.importorskip('torch')

import jax
import jax.numpy as jnp

from cnn_quantization_tpu.models import build_model
from cnn_quantization_tpu.engine import QuantEngine, QuantPolicy, TapContext
from cnn_quantization_tpu.utils.torch_import import import_arch
from cnn_quantization_tpu.calib.calibrator import collect_statistics

from reference_loader import (load_reference_manager, make_ref_args,
                              make_ref_qparams)


def make_torch_resnet18(num_classes=1000):
    """torchvision-faithful ResNet-18 (2015-era construction order:
    downsample Sequential built before the block's own convs, AvgPool2d
    tail), instantiated AFTER QM.enable() so every layer is a ``*WithId``.

    Must be called with the reference manager's monkeypatch active.
    """
    import torch.nn as nn

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None):
            super().__init__()
            self.conv1 = nn.Conv2d(inplanes, planes, 3, stride, 1, bias=False)
            self.bn1 = nn.BatchNorm2d(planes)
            self.relu = nn.ReLU(inplace=False)
            self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1, bias=False)
            self.bn2 = nn.BatchNorm2d(planes)
            self.downsample = downsample

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet(nn.Module):
        def __init__(self, layers=(2, 2, 2, 2)):
            super().__init__()
            self.inplanes = 64
            self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
            self.bn1 = nn.BatchNorm2d(64)
            self.relu = nn.ReLU(inplace=False)
            self.maxpool = nn.MaxPool2d(3, 2, 1)
            self.layer1 = self._make_layer(64, layers[0], 1)
            self.layer2 = self._make_layer(128, layers[1], 2)
            self.layer3 = self._make_layer(256, layers[2], 2)
            self.layer4 = self._make_layer(512, layers[3], 2)
            self.avgpool = nn.AvgPool2d(2, stride=1)  # 64x64 input -> 2x2
            self.fc = nn.Linear(512, num_classes)

        def _make_layer(self, planes, blocks, stride):
            downsample = None
            if stride != 1 or self.inplanes != planes:
                downsample = nn.Sequential(
                    nn.Conv2d(self.inplanes, planes, 1, stride, bias=False),
                    nn.BatchNorm2d(planes))
            layers_ = [BasicBlock(self.inplanes, planes, stride, downsample)]
            self.inplanes = planes
            for _ in range(1, blocks):
                layers_.append(BasicBlock(planes, planes))
            return nn.Sequential(*layers_)

        def forward(self, x):
            x = self.maxpool(self.relu(self.bn1(self.conv1(x))))
            x = self.layer4(self.layer3(self.layer2(self.layer1(x))))
            x = self.avgpool(x)
            x = x.view(x.size(0), -1)
            return self.fc(x)

    return ResNet()


def mark_before_relu(model):
    """utils/mark_relu.py:14-29 for BasicBlock resnets, without the
    torchvision isinstance (our twin defines its own BasicBlock): stem conv
    + conv1/bn1 of every block."""
    model.conv1.before_relu = True
    for layer in (model.layer1, model.layer2, model.layer3, model.layer4):
        for block in layer:
            block.conv1.before_relu = True
            block.bn1.before_relu = True


def randomize_bn(model, seed=7):
    """Non-trivial BN running stats/affine so the fold actually does work."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.05)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
            m.weight.data.copy_(torch.rand(m.num_features, generator=g) * 0.4 + 0.8)
            m.bias.data.copy_(torch.randn(m.num_features, generator=g) * 0.05)


def run_reference(cfg, x_nchw, tmp_base, stats_mode='no', collect_batches=None):
    """Build + quantize + run the torch twin under the reference manager.

    Returns (logits, float_state_dict) — the state dict snapshotted before
    folding/quantization, i.e. the weights our pipeline starts from.
    """
    ns = load_reference_manager()
    import utils.model_naming as model_naming

    def build():
        torch.manual_seed(12345)  # inference_sim.py:127
        model = make_torch_resnet18()
        randomize_bn(model)
        model_naming.set_node_names(model)
        mark_before_relu(model)
        return model

    state0 = None
    if stats_mode == 'use':
        # phase 1: collect with the reference's own statistic manager
        ns.reset(stats_base_dir=tmp_base)
        args = make_ref_args(stats_mode='collect', **cfg)
        qm = ns.iqm.QuantizationManagerInference(args, make_ref_qparams(args))
        qm.__enter__()
        try:
            model = build()
            state0 = {k: v.detach().clone().numpy()
                      for k, v in model.state_dict().items()}
            ns.search_absorbe_bn(model)
            qm.bn_folding = True
            model.eval()
            qm.quantize_model(model)  # no-op in collect mode (i_q_m.py:353)
            with torch.no_grad():
                for xb in collect_batches:
                    model(torch.from_numpy(xb))
        finally:
            qm.__exit__()

    ns.reset(stats_base_dir=tmp_base)
    args = make_ref_args(stats_mode=stats_mode, **cfg)
    qm = ns.iqm.QuantizationManagerInference(args, make_ref_qparams(args))
    qm.__enter__()
    try:
        model = build()
        if state0 is None:
            state0 = {k: v.detach().clone().numpy()
                      for k, v in model.state_dict().items()}
        ns.search_absorbe_bn(model)
        qm.bn_folding = True
        model.eval()
        qm.quantize_model(model)
        with torch.no_grad():
            logits = model(torch.from_numpy(x_nchw)).numpy()
    finally:
        qm.__exit__()
    return logits, state0


def run_ours(policy, state0, x_nhwc, stats=None):
    model, meta = build_model('resnet18')
    params = import_arch('resnet18', state0, fold_bn=True)
    eng = QuantEngine(model, policy, meta)
    pq = eng.quantize_params(params)
    logits, _ = eng.jit_forward(quantized=True)(pq, stats, jnp.asarray(x_nhwc))
    return np.asarray(logits)


def _agree(ref, ours, rel_tol=2e-3):
    rel = np.linalg.norm(ours - ref) / (np.linalg.norm(ref) + 1e-12)
    assert rel < rel_tol, f'logit rel err {rel:.2e}'
    assert (np.argmax(ref, -1) == np.argmax(ours, -1)).all()
    return rel


@pytest.fixture(scope='module')
def images():
    rng = np.random.RandomState(3)
    x = rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
    return x, np.ascontiguousarray(x.transpose(0, 3, 1, 2))


def test_naive_w4a4(images, tmp_path):
    """README.md:53-55 config: -pcq_w -pcq_a --qtype int4 -qw int4."""
    x_nhwc, x_nchw = images
    cfg = dict(qtype='int4', qweight='int4', per_channel_quant_weights=True,
               per_channel_quant_act=True)
    ref, state0 = run_reference(cfg, x_nchw, tmp_path)
    ours = run_ours(QuantPolicy(qtype='int4', qweight='int4',
                                pcq_weights=True, pcq_act=True,
                                arch='resnet18'), state0, x_nhwc)
    _agree(ref, ours)


def test_headline_laplace_bitalloc_bcw(images, tmp_path):
    """README.md:57-61 headline: + -c laplace -baa -baw -bcw."""
    x_nhwc, x_nchw = images
    cfg = dict(qtype='int4', qweight='int4', per_channel_quant_weights=True,
               per_channel_quant_act=True, clipping='laplace',
               bit_alloc_act=True, bit_alloc_weight=True,
               bias_corr_weight=True)
    ref, state0 = run_reference(cfg, x_nchw, tmp_path)
    ours = run_ours(QuantPolicy(qtype='int4', qweight='int4',
                                pcq_weights=True, pcq_act=True,
                                clipping='laplace', bit_alloc_act=True,
                                bit_alloc_weight=True, bias_corr_weight=True,
                                arch='resnet18'), state0, x_nhwc)
    _agree(ref, ours)


def test_2std_clipping(images, tmp_path):
    """README.md:117-121 config: --qtype int4 -c 2std."""
    x_nhwc, x_nchw = images
    cfg = dict(qtype='int4', qweight='int8', clipping='2std')
    ref, state0 = run_reference(cfg, x_nchw, tmp_path)
    ours = run_ours(QuantPolicy(qtype='int4', qweight='int8',
                                clipping='2std', arch='resnet18'),
                    state0, x_nhwc)
    _agree(ref, ours)


def test_aciq_layerwise_use_stats(images, tmp_path):
    """README.md:123-127 config: int4 -c laplace -sm use (per-tensor ACIQ
    with offline statistics) — the full collect->use pipeline on BOTH
    sides: the reference collects through its StatisticManager CSV
    round-trip, we collect through calib.calibrator, and the frozen
    quantization grids must still agree."""
    x_nhwc, x_nchw = images
    rng = np.random.RandomState(11)
    cal_nhwc = [rng.rand(2, 64, 64, 3).astype(np.float32) * 2 - 1
                for _ in range(2)]
    cal_nchw = [np.ascontiguousarray(b.transpose(0, 3, 1, 2))
                for b in cal_nhwc]
    cfg = dict(qtype='int4', qweight='int4', per_channel_quant_weights=True,
               clipping='laplace')
    ref, state0 = run_reference(cfg, x_nchw, tmp_path, stats_mode='use',
                                collect_batches=cal_nchw)
    policy = QuantPolicy(qtype='int4', qweight='int4', pcq_weights=True,
                         clipping='laplace', arch='resnet18')
    model, meta = build_model('resnet18')
    params = import_arch('resnet18', state0, fold_bn=True)
    eng = QuantEngine(model, policy, meta)
    stats = collect_statistics(
        eng.jit_collect(per_channel=False), params,
        [(b, np.zeros(len(b), np.int32)) for b in cal_nhwc])
    pq = eng.quantize_params(params)
    ours, _ = eng.jit_forward(quantized=True)(pq, stats, jnp.asarray(x_nhwc))
    _agree(ref, np.asarray(ours))
