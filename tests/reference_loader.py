"""Import the reference PyTorch quantizer (/root/reference) on CPU.

The reference is CUDA-only at two points:
  * module-level ``import int_quantization`` (the compiled CUDA extension,
    reference: kernels/int_quantization.cpp:10-12) — stubbed here with a
    numerically faithful CPU implementation of ``float2gemmlowp``
    (reference: kernels/gemmlowp.cu:8-45);
  * ``IntQuantizer.__gemmlowpQuantize__`` allocates its zero-noise tensor via
    ``torch.cuda.FloatTensor`` (int_quantizer.py:610) — patched to a CPU
    equivalent with identical semantics.

The manager module also imports ``torchvision`` solely for an
``isinstance(model, torchvision.models.Inception3)`` check
(inference_quantization_manager.py:360); a minimal stub satisfies it.

This loader exists so the differential parity tests can feed identical
tensors through the reference implementation and through
``cnn_quantization_tpu`` and assert near-bit-exact agreement — the strongest
available substitute for reproducing the reference's published ImageNet
numbers in an environment with no network, no pretrained checkpoints and no
ImageNet data (see ACCURACY.md).
"""

from __future__ import annotations

import sys
import types

REFERENCE_ROOT = '/root/reference'

_loaded = None


def _float2gemmlowp_cpu(tensor, delta, offset, num_bits, int_exp,
                        enforce_true_zero, noise):
    """CPU port of kernels/gemmlowp.cu:30-45 + the GEMMLowpKernel body.

    Uses float32 scalar math like the CUDA wrapper (which takes ``float``
    arguments) and round-half-away-from-zero like ``roundf``.
    """
    import torch
    import numpy as np

    delta = float(delta)
    offset = float(offset)
    if delta <= 0:
        return tensor

    qmax = float((1 << num_bits) - 1)
    scale = np.float32(delta) / np.float32(qmax)
    if int_exp:
        scale = np.float32(2.0 ** int(np.ceil(np.log2(scale))))
    zero_point = np.float32(np.round(-np.float32(offset) / scale))
    shift = zero_point if enforce_true_zero else np.float32(-offset)

    out = tensor.clone().float()
    if enforce_true_zero:
        out = out / float(scale) + float(shift)
    else:
        out = (out + float(shift)) / float(scale)
    out = out + noise
    out = torch.clamp(out, 0.0, qmax)
    # roundf = half away from zero (torch.round is half-to-even)
    out = torch.sign(out) * torch.floor(torch.abs(out) + 0.5)
    if enforce_true_zero:
        out = (out - float(shift)) * float(scale)
    else:
        out = out * float(scale) - float(shift)
    return out


def load_reference():
    """Import and return the reference quantization modules (cached).

    Returns a namespace with ``int_quantizer`` (factory), ``IntQuantizer``,
    and the manager module, or raises ImportError if /root/reference is
    unavailable.
    """
    global _loaded
    if _loaded is not None:
        return _loaded

    import os
    if not os.path.isdir(REFERENCE_ROOT):
        raise ImportError(f'{REFERENCE_ROOT} not present')

    import torch

    # Stub the CUDA extension before the reference imports it.
    if 'int_quantization' not in sys.modules:
        ext = types.ModuleType('int_quantization')
        ext.float2gemmlowp = _float2gemmlowp_cpu
        sys.modules['int_quantization'] = ext

    # Stub torchvision (only Inception3 isinstance checks are needed).
    if 'torchvision' not in sys.modules:
        tv = types.ModuleType('torchvision')
        tvm = types.ModuleType('torchvision.models')
        tvm.Inception3 = type('Inception3', (), {})
        tv.models = tvm
        sys.modules['torchvision'] = tv
        sys.modules['torchvision.models'] = tvm

    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)

    from pytorch_quantizer.quantization.qtypes.int_quantizer import (
        IntQuantizer, int_quantizer)

    # CPU-safe noise allocation for the native-kernel path
    # (int_quantizer.py:605-614 hardcodes torch.cuda.FloatTensor).
    def _gemmlowp_cpu(self, tensor, delta, offset):
        noise = (tensor.new(tensor.shape).uniform_(-0.5, 0.5)
                 if self.stochastic else torch.zeros_like(tensor))
        preserve_zero = (self.enforce_true_zero
                         and float(offset + delta) > 0 and float(offset) < 0)
        return sys.modules['int_quantization'].float2gemmlowp(
            tensor.contiguous(), delta, offset, self.num_bits, self.int_exp,
            preserve_zero, noise)

    # NB: trailing double underscore means Python does NOT name-mangle this.
    IntQuantizer.__gemmlowpQuantize__ = _gemmlowp_cpu

    # Restore the reference's CUDA semantics for get_alpha_mult on CPU: it
    # does ``omega.cpu().numpy()`` then ``omega *= 2`` (int_quantizer.py:139-141).
    # On CUDA ``.cpu()`` copies; on a CPU tensor it aliases, so the in-place
    # doubling would corrupt the caller's omega (used later for Delta and the
    # clamp window, :198-210).  The published numbers ran on CUDA — pass a
    # clone so the CPU run matches them.
    _orig_get_alpha_mult = IntQuantizer.get_alpha_mult

    def _get_alpha_mult(omega, sym=True):
        if isinstance(omega, torch.Tensor):
            omega = omega.clone()
        return _orig_get_alpha_mult(omega, sym=sym)

    IntQuantizer.get_alpha_mult = staticmethod(_get_alpha_mult)

    ns = types.SimpleNamespace(IntQuantizer=IntQuantizer,
                               int_quantizer=int_quantizer)
    _loaded = ns
    return ns


DEFAULT_PARAMS = dict(
    # Mirrors inference_sim.py get_params() defaults for the 'int' family.
    clipping='no', stats_kind='mean', kld=False,
    pcq_weights=False, pcq_act=False,
    bit_alloc_act=False, bit_alloc_weight=False,
    bcorr_act=False, bcorr_weight=False, vcorr_weight=False,
    bit_alloc_rmode='round', bit_alloc_prior='gaus',
    bit_alloc_target_act=None, bit_alloc_target_weight=None,
    measure_entropy=False, logger=None, mtd_quant=False,
)


def make_ref_quantizer(qtype='int8', **overrides):
    """Build a reference IntQuantizer with CLI-default params, then apply
    attribute overrides the way TruncationOpManagerInference.__fill_quantizers__
    does (inference_quantization_manager.py:407-476)."""
    ref = load_reference()
    params = dict(DEFAULT_PARAMS)
    for k in list(overrides):
        if k in params:
            params[k] = overrides.pop(k)
    q = ref.int_quantizer(qtype, params)
    for k, v in overrides.items():
        setattr(q, k, v)
    return q


class FakeStatManager:
    """Dict-backed stand-in for the reference StatisticManager singleton.

    ``table`` maps (stat, kind) -> scalar or per-channel numpy vector, the
    same values our site_stats dict carries as '{kind}_{stat}'.
    """

    def __init__(self, table):
        self.table = dict(table)

    def get_tensor_stat(self, stat_id, stat, kind='mean'):
        return self.table[(stat, kind)]


def attach_fake_stats(q, table):
    """Point a reference quantizer's ``self.sm()`` at dict-backed stats."""
    fake = FakeStatManager(table)
    q.sm = lambda: fake
    return fake


def site_stats_from_table(table):
    """Convert a (stat, kind)->value table to our site_stats dict form."""
    return {f'{kind}_{stat}': v for (stat, kind), v in table.items()}


_manager_ns = None


def load_reference_manager():
    """Import the reference's full inference manager stack on CPU (cached).

    Returns a namespace with the manager module (``QMI``, ``Singleton``,
    the ``*WithId`` layer classes), ``absorb_bn`` (patched CPU-safe — the
    reference hardcodes ``.cuda()`` on the re-registered BN buffers,
    utils/absorb_bn.py:19-20), the statistic-manager modules, and
    ``reset(stats_base_dir=None)`` which clears every singleton/id-counter
    so each test config starts exactly like a fresh reference process.
    """
    global _manager_ns
    if _manager_ns is not None:
        return _manager_ns

    load_reference()  # installs torchvision/int_quantization stubs + sys.path

    import torch
    from itertools import count

    import utils.absorb_bn as absorb_bn_mod
    from utils.misc import Singleton
    import pytorch_quantizer.quantization.inference.inference_quantization_manager as iqm
    import pytorch_quantizer.quantization.inference.statistic_manager as sm_mod
    import pytorch_quantizer.quantization.inference.statistic_manager_perchannel as smpc_mod
    import pytorch_quantizer.quantization.inference.distance_stats as ds_mod

    _orig_cuda = torch.Tensor.cuda

    def search_absorbe_bn_cpu(model):
        """Reference BN fold with ``.cuda()`` neutralized (CPU test host)."""
        torch.Tensor.cuda = lambda self, *a, **k: self
        try:
            absorb_bn_mod.search_absorbe_bn(model)
        finally:
            torch.Tensor.cuda = _orig_cuda

    # StatisticManager.__init__ mutates its *mutable default* stats list
    # (statistic_manager.py:16-31 appends the error columns to it), so a
    # second instantiation in one process would duplicate columns; snapshot
    # the pristine defaults now, restore copies on every reset.
    _sm_defaults = tuple(
        list(v) if isinstance(v, list) else v
        for v in sm_mod.StatisticManager.__init__.__defaults__)
    _smpc_defaults = tuple(
        list(v) if isinstance(v, list) else v
        for v in smpc_mod.StatisticManagerPerChannel.__init__.__defaults__)

    def reset(stats_base_dir=None):
        """Fresh-process state: clear singletons, restore nn classes, zero the
        construction-order id counters, and redirect the stats store."""
        for cls in (iqm.QuantizationManagerInference, sm_mod.StatisticManager,
                    smpc_mod.StatisticManagerPerChannel, ds_mod.MeasureStatistics):
            Singleton._instances.pop(cls, None)
        sm_mod.StatisticManager.__init__.__defaults__ = tuple(
            list(v) if isinstance(v, list) else v for v in _sm_defaults)
        smpc_mod.StatisticManagerPerChannel.__init__.__defaults__ = tuple(
            list(v) if isinstance(v, list) else v for v in _smpc_defaults)
        for cls in (iqm.Conv2dWithId, iqm.LinearWithId, iqm.BatchNorm2dWithId,
                    iqm.MaxPool2dWithId, iqm.AvgPool2dWithId, iqm.ReLUWithId):
            cls._id = count(0)
        # restore original nn classes in case a prior context leaked
        torch.nn.Linear = iqm.nn.Linear = torch.nn.modules.linear.Linear
        torch.nn.Conv2d = iqm.nn.Conv2d = torch.nn.modules.conv.Conv2d
        torch.nn.BatchNorm2d = iqm.nn.BatchNorm2d = torch.nn.modules.batchnorm.BatchNorm2d
        torch.nn.MaxPool2d = iqm.nn.MaxPool2d = torch.nn.modules.pooling.MaxPool2d
        torch.nn.AvgPool2d = iqm.nn.AvgPool2d = torch.nn.modules.pooling.AvgPool2d
        torch.nn.ReLU = iqm.nn.ReLU = torch.nn.modules.activation.ReLU
        if stats_base_dir is not None:
            sm_mod.base_dir = str(stats_base_dir)
            smpc_mod.base_dir = str(stats_base_dir)
            ds_mod.base_dir = str(stats_base_dir)

    ns = types.SimpleNamespace(
        iqm=iqm, sm_mod=sm_mod, smpc_mod=smpc_mod, Singleton=Singleton,
        search_absorbe_bn=search_absorbe_bn_cpu, reset=reset)
    _manager_ns = ns
    return ns


def make_ref_args(**overrides):
    """argparse-namespace twin of the reference CLI defaults
    (inference/inference_sim.py:52-112) — only the fields the manager reads."""
    defaults = dict(
        arch='resnet18', qtype=None, qweight='int8', q_off=False,
        clipping='no', stats_kind='mean', preserve_zero=False,
        kld_threshold=False, per_channel_quant_weights=False,
        per_channel_quant_act=False, bit_alloc_act=False,
        bit_alloc_weight=False, bit_alloc_rmode='round',
        bit_alloc_prior='gaus', bit_alloc_target_act=None,
        bit_alloc_target_weight=None, bias_corr_act=False,
        bias_corr_weight=False, var_corr_weight=False,
        measure_entropy=False, mid_thread_quant=False,
        stats_mode='no', stats_folder=None, stats_batch_avg=False,
        measure_stats=False, rho_act=None, rho_weight=None)
    defaults.update(overrides)
    return types.SimpleNamespace(**defaults)


def make_ref_qparams(args):
    """Twin of the reference CLI's ``get_params()``
    (inference/inference_sim.py:345-372)."""
    return {
        'int': {
            'clipping': args.clipping,
            'stats_kind': args.stats_kind,
            'true_zero': args.preserve_zero,
            'kld': args.kld_threshold,
            'pcq_weights': args.per_channel_quant_weights,
            'pcq_act': args.per_channel_quant_act,
            'bit_alloc_act': args.bit_alloc_act,
            'bit_alloc_weight': args.bit_alloc_weight,
            'bit_alloc_rmode': args.bit_alloc_rmode,
            'bit_alloc_prior': args.bit_alloc_prior,
            'bit_alloc_target_act': args.bit_alloc_target_act,
            'bit_alloc_target_weight': args.bit_alloc_target_weight,
            'bcorr_act': args.bias_corr_act,
            'bcorr_weight': args.bias_corr_weight,
            'vcorr_weight': args.var_corr_weight,
            'logger': None,
            'measure_entropy': args.measure_entropy,
            'mtd_quant': args.mid_thread_quant,
        },
        'qmanager': {'rho_act': args.rho_act, 'rho_weight': args.rho_weight},
    }
