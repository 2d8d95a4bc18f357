"""Differential numerical-parity harness vs the reference implementation.

Feeds identical tensors through the reference's ``IntQuantizer``
(/root/reference/pytorch_quantizer/quantization/qtypes/int_quantizer.py,
imported on CPU via tests/reference_loader.py) and through
``cnn_quantization_tpu.ops.quantizer`` across the full config matrix
{laplace, gaus, 2std, minmax, kld, mix} x {per-channel, per-tensor} x
{bit-alloc on/off} x {half_range} x bits {8, 4}, plus weight bias/variance
correction and mid-tread quantization, and asserts near-bit-exact agreement.

With no network, no pretrained checkpoints and no ImageNet data in this
environment, this matrix — together with tests/test_full_model_parity.py —
is the evidence that the framework reproduces the reference's published
accuracy numbers (BASELINE.md); see ACCURACY.md.

Tolerance: both sides compute in float32 but in different op orders, so a
value that lands within float-noise of a rounding boundary may flip by one
quantization step.  We require >= 99.9% of elements to agree to ~1e-5 of the
tensor range and bound every disagreement by one grid step.
"""

from __future__ import annotations

import numpy as np
import pytest

torch = pytest.importorskip('torch')

from reference_loader import (attach_fake_stats, load_reference,
                              make_ref_quantizer, site_stats_from_table)

try:
    load_reference()
except ImportError:  # pragma: no cover - reference tree not present
    pytest.skip('/root/reference unavailable', allow_module_level=True)

import jax.numpy as jnp

from cnn_quantization_tpu.ops import aciq, bit_alloc as ba
from cnn_quantization_tpu.ops.bias_corr import (activation_bias_correction,
                                                weight_correction)
from cnn_quantization_tpu.ops.entropy import shannon_entropy
from cnn_quantization_tpu.ops.quantizer import (QuantConfig,
                                                quantize_activation,
                                                quantize_weight)

RNG = np.random.default_rng(20260819)


def _act4d(n=8, c=16, h=14, w=14, positive=False, seed=0):
    """Conv-activation-like data: per-channel scale and mean spread."""
    rng = np.random.default_rng(seed)
    scales = rng.uniform(0.3, 3.0, size=(1, c, 1, 1)).astype(np.float32)
    means = rng.uniform(-1.0, 1.0, size=(1, c, 1, 1)).astype(np.float32)
    x = rng.standard_normal((n, c, h, w)).astype(np.float32) * scales + means
    if positive:
        x = np.maximum(x, 0.0)
    return x


def _act2d(n=8, m=1000, seed=1):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal((n, m)).astype(np.float32) * 2.5 - 0.3)


def _weight(ofm=32, ifm=16, k=3, seed=2):
    rng = np.random.default_rng(seed)
    scales = rng.uniform(0.05, 0.8, size=(ofm, 1, 1, 1)).astype(np.float32)
    return rng.standard_normal((ofm, ifm, k, k)).astype(np.float32) * scales


def assert_quant_parity(ref, mine, grid_step, frac=0.999, rel=3e-5):
    """ref/mine are dequantized tensors; grid_step bounds a rounding flip."""
    ref = np.asarray(ref, np.float32)
    mine = np.asarray(mine, np.float32)
    assert ref.shape == mine.shape
    rng_ = max(float(ref.max() - ref.min()), 1e-6)
    diff = np.abs(ref - mine)
    atol = rel * rng_
    agree = float(np.mean(diff <= atol))
    assert agree >= frac, f'only {agree:.6f} of elements agree (atol={atol:g})'
    bound = float(np.max(grid_step)) * 1.01 + atol
    assert diff.max() <= bound, f'max diff {diff.max():g} > one grid step {bound:g}'


def _grid_step(x, num_bits):
    return (np.float32(x.max() - x.min())) / (2.0 ** num_bits - 1.0)


# ---------------------------------------------------------------------------
# Analytic pieces
# ---------------------------------------------------------------------------

def test_alpha_tables_match_reference():
    q = make_ref_quantizer('int4')
    for bits in range(9):
        assert float(aciq.LAPLACE_TABLE[bits]) == pytest.approx(q.alpha_laplace[bits])
        assert float(aciq.LAPLACE_POSITIVE_TABLE[bits]) == pytest.approx(
            q.alpha_laplace_positive[bits])
    for bits in range(1, 9):
        assert float(aciq.GAUS_TABLE[bits]) == pytest.approx(q.alpha_gaus[bits])
        assert float(aciq.GAUS_POSITIVE_TABLE[bits]) == pytest.approx(
            q.alpha_gaus_positive[bits])


@pytest.mark.parametrize('sym', [True, False])
def test_alpha_mult_interpolation_matches_reference(sym):
    ref = load_reference()
    # Stay below half the table max: the reference doubles omega for the
    # asymmetric case and *crashes* past its table end (int_quantizer.py:142).
    omega = np.array([0.02, 0.09, 0.4, 1.0, 3.7, 12.0, 55.0, 240.0, 450.0],
                     dtype=np.float32)
    got = np.asarray(aciq.alpha_mult_for_omega(omega, sym=sym))
    want = ref.IntQuantizer.get_alpha_mult(torch.from_numpy(omega.copy()), sym=sym)
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-4)


@pytest.mark.parametrize('round_mode', [True, False])
@pytest.mark.parametrize('target', [4, 2])
def test_bit_alloc_fixed_target_matches_reference(round_mode, target):
    ref = load_reference()
    sigma = np.abs(RNG.standard_normal(64)).astype(np.float32) + 0.01
    want = ref.IntQuantizer.get_bits_alloc_fixed_target(
        torch.from_numpy(sigma), target, round_mode)
    got = ba.get_bits_alloc_fixed_target(jnp.asarray(sigma), target, round_mode)
    np.testing.assert_array_equal(np.asarray(got), want.numpy())


def test_entropy_matches_reference():
    from utils.entropy import shannon_entropy as ref_entropy
    codes = RNG.integers(0, 15, size=(4096,)).astype(np.int64)
    codes[:2048] = 3  # skewed distribution
    want = float(ref_entropy(torch.from_numpy(codes)))
    got = float(shannon_entropy(jnp.asarray(codes)))
    assert got == pytest.approx(want, rel=1e-5)


# ---------------------------------------------------------------------------
# Per-tensor min/max (native-kernel path, int_quantizer.py:361-379 + gemmlowp.cu)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('bits', [8, 4])
@pytest.mark.parametrize('tag', ['activation', 'activation_classifier',
                                 'activation_pooling'])
@pytest.mark.parametrize('half_range', [False, True])
def test_per_tensor_minmax(bits, tag, half_range):
    x = _act2d(seed=10) if 'classifier' in tag else _act4d(seed=11)
    q = make_ref_quantizer(f'int{bits}')
    q.half_range = half_range
    want = q(torch.from_numpy(x.copy()), 'id', tag).numpy()

    cfg = QuantConfig(num_bits=bits)
    got, _ = quantize_activation(jnp.asarray(x), cfg, half_range=half_range,
                                 channel_axis=1, tag=tag)
    assert_quant_parity(want, got, _grid_step(x, bits))


def test_per_tensor_minmax_positive_data():
    # Post-ReLU pooling output: min > 0, exercises the non-true-zero kernel form.
    x = _act4d(seed=12, positive=True) + 0.05
    q = make_ref_quantizer('int8')
    want = q(torch.from_numpy(x.copy()), 'id', 'activation_pooling').numpy()
    got, _ = quantize_activation(jnp.asarray(x), QuantConfig(num_bits=8),
                                 channel_axis=1, tag='activation_pooling')
    assert_quant_parity(want, got, _grid_step(x, 8))


@pytest.mark.parametrize('stats_kind', ['mean', 'max'])
def test_per_tensor_minmax_from_stats(stats_kind):
    x = _act2d(seed=13)
    table = {('min', 'mean'): float(x.min()) * 0.9,
             ('max', 'mean'): float(x.max()) * 0.9,
             ('min', 'min'): float(x.min()),
             ('max', 'max'): float(x.max())}
    q = make_ref_quantizer('int8', stats_kind=stats_kind)
    attach_fake_stats(q, table)
    want = q(torch.from_numpy(x.copy()), 'id', 'activation_classifier',
             stat_id='sid').numpy()

    cfg = QuantConfig(num_bits=8, stats_kind=stats_kind)
    got, _ = quantize_activation(jnp.asarray(x), cfg,
                                 site_stats=site_stats_from_table(table),
                                 channel_axis=1, tag='activation_classifier')
    assert_quant_parity(want, got, _grid_step(x, 8))


# ---------------------------------------------------------------------------
# Per-channel min/max activations (int_quantizer.py:409-451)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('bits,bit_alloc', [(8, False), (4, False), (4, True)])
@pytest.mark.parametrize('half_range', [False, True])
def test_per_channel_minmax(bits, bit_alloc, half_range):
    x = _act4d(seed=20)
    q = make_ref_quantizer(f'int{bits}', pcq_act=True, bit_alloc_act=bit_alloc)
    q.half_range = half_range
    want = q(torch.from_numpy(x.copy()), 'id', 'activation').numpy()

    cfg = QuantConfig(num_bits=bits, pcq_a=True, bit_alloc_act=bit_alloc)
    got, _ = quantize_activation(jnp.asarray(x), cfg, half_range=half_range,
                                 channel_axis=1, tag='activation')
    # per-channel ranges: bound flips by the largest channel grid step
    step = (x.max(axis=(0, 2, 3)) - x.min(axis=(0, 2, 3))).max() / (2 ** max(bits - 3, 0))
    assert_quant_parity(want, got, step)


@pytest.mark.parametrize('prior', ['gaus', 'laplace'])
def test_per_channel_minmax_bit_alloc_prior(prior):
    x = _act4d(seed=21)
    q = make_ref_quantizer('int4', pcq_act=True, bit_alloc_act=True,
                           bit_alloc_prior=prior)
    want = q(torch.from_numpy(x.copy()), 'id', 'activation').numpy()
    cfg = QuantConfig(num_bits=4, pcq_a=True, bit_alloc_act=True,
                      bit_alloc_prior=prior)
    got, _ = quantize_activation(jnp.asarray(x), cfg, channel_axis=1)
    step = (x.max(axis=(0, 2, 3)) - x.min(axis=(0, 2, 3))).max()
    assert_quant_parity(want, got, step)


# ---------------------------------------------------------------------------
# ACIQ clipping (int_quantizer.py:227-359)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('clip', ['laplace', 'gaus', '2std'])
@pytest.mark.parametrize('bits', [8, 4])
@pytest.mark.parametrize('half_range', [False, True])
def test_clipping_per_tensor(clip, bits, half_range):
    x = _act4d(seed=30, positive=half_range)
    q = make_ref_quantizer(f'int{bits}', clipping=clip)
    q.half_range = half_range
    want = q(torch.from_numpy(x.copy()), 'id', 'activation').numpy()

    cfg = QuantConfig(num_bits=bits, clipping=clip)
    got, _ = quantize_activation(jnp.asarray(x), cfg, half_range=half_range,
                                 channel_axis=1, tag='activation')
    assert_quant_parity(want, got, _grid_step(x, bits))


@pytest.mark.parametrize('clip', ['laplace', 'gaus', '2std'])
@pytest.mark.parametrize('bit_alloc', [False, True])
def test_clipping_per_channel(clip, bit_alloc):
    x = _act4d(seed=31)
    q = make_ref_quantizer('int4', clipping=clip, pcq_act=True,
                           bit_alloc_act=bit_alloc)
    want = q(torch.from_numpy(x.copy()), 'id', 'activation').numpy()

    cfg = QuantConfig(num_bits=4, clipping=clip, pcq_a=True,
                      bit_alloc_act=bit_alloc)
    got, _ = quantize_activation(jnp.asarray(x), cfg, channel_axis=1)
    step = (x.max(axis=(0, 2, 3)) - x.min(axis=(0, 2, 3))).max()
    assert_quant_parity(want, got, step)


def test_clipping_per_channel_half_range_bit_alloc():
    # The headline W4A4 recipe shape: laplace + bit-alloc + half-range
    x = _act4d(seed=32)
    q = make_ref_quantizer('int4', clipping='laplace', pcq_act=True,
                           bit_alloc_act=True)
    q.half_range = True
    want = q(torch.from_numpy(x.copy()), 'id', 'activation').numpy()

    cfg = QuantConfig(num_bits=4, clipping='laplace', pcq_a=True,
                      bit_alloc_act=True)
    got, _ = quantize_activation(jnp.asarray(x), cfg, half_range=True,
                                 channel_axis=1)
    step = (x.max(axis=(0, 2, 3)) - x.min(axis=(0, 2, 3))).max()
    assert_quant_parity(want, got, step)


def test_clipping_per_tensor_from_stats():
    # Layer-wise ACIQ (-c laplace -sm use): stats-driven per-tensor clipping.
    x = _act4d(seed=33)
    flat = x.reshape(-1)
    table = {('min', 'mean'): float(flat.min()),
             ('max', 'mean'): float(flat.max()),
             ('mean', 'mean'): float(flat.mean()),
             ('b', 'mean'): float(np.abs(flat - flat.mean()).mean()),
             ('std', 'mean'): float(flat.std(ddof=1))}
    q = make_ref_quantizer('int4', clipping='laplace')
    attach_fake_stats(q, table)
    want = q(torch.from_numpy(x.copy()), 'id', 'activation', stat_id='s').numpy()

    cfg = QuantConfig(num_bits=4, clipping='laplace')
    got, _ = quantize_activation(jnp.asarray(x), cfg,
                                 site_stats=site_stats_from_table(table),
                                 channel_axis=1)
    assert_quant_parity(want, got, _grid_step(x, 4))


def test_clipping_per_channel_from_stats_with_bit_alloc():
    # Offline-stats headline recipe: per-channel stats drive alpha + bit-alloc.
    x = _act4d(seed=34)
    t = x.transpose(1, 0, 2, 3).reshape(x.shape[1], -1)
    table = {('min', 'mean'): t.min(axis=-1),
             ('max', 'mean'): t.max(axis=-1),
             ('mean', 'mean'): t.mean(axis=-1),
             ('b', 'mean'): np.abs(t - t.mean(axis=-1, keepdims=True)).mean(axis=-1),
             ('std', 'mean'): t.std(axis=-1, ddof=1)}
    q = make_ref_quantizer('int4', clipping='laplace', pcq_act=True,
                           bit_alloc_act=True)
    attach_fake_stats(q, table)
    want = q(torch.from_numpy(x.copy()), 'id', 'activation', stat_id='s').numpy()

    cfg = QuantConfig(num_bits=4, clipping='laplace', pcq_a=True,
                      bit_alloc_act=True)
    got, _ = quantize_activation(jnp.asarray(x), cfg,
                                 site_stats=site_stats_from_table(table),
                                 channel_axis=1)
    step = (t.max(axis=-1) - t.min(axis=-1)).max()
    assert_quant_parity(want, got, step)


def test_mix_clipping_from_stats():
    x = _act4d(seed=35)
    flat = x.reshape(-1)
    table = {('min', 'mean'): float(flat.min()),
             ('max', 'mean'): float(flat.max()),
             ('mean', 'mean'): float(flat.mean()),
             ('b', 'mean'): float(np.abs(flat - flat.mean()).mean()),
             ('std', 'mean'): float(flat.std(ddof=1)),
             ('mse_laplace', 'mean'): 0.02,
             ('mse_gaus', 'mean'): 0.01,
             ('mse_lowp', 'mean'): 0.05}
    q = make_ref_quantizer('int4', clipping='mix')
    attach_fake_stats(q, table)
    want = q(torch.from_numpy(x.copy()), 'id', 'activation', stat_id='s').numpy()

    cfg = QuantConfig(num_bits=4, clipping='mix')
    got, _ = quantize_activation(jnp.asarray(x), cfg,
                                 site_stats=site_stats_from_table(table),
                                 channel_axis=1)
    assert_quant_parity(want, got, _grid_step(x, 4))


def test_kld_quantize_from_stats():
    x = _act4d(seed=36)
    flat = x.reshape(-1)
    table = {('min', 'mean'): float(flat.min()),
             ('max', 'mean'): float(flat.max()),
             ('mean', 'mean'): float(flat.mean()),
             ('kld_th', 'mean'): float(np.quantile(np.abs(flat), 0.98))}
    q = make_ref_quantizer('int8', kld=True)
    attach_fake_stats(q, table)
    want = q(torch.from_numpy(x.copy()), 'id', 'activation', stat_id='s').numpy()

    cfg = QuantConfig(num_bits=8, kld=True)
    got, _ = quantize_activation(jnp.asarray(x), cfg,
                                 site_stats=site_stats_from_table(table),
                                 channel_axis=1)
    assert_quant_parity(want, got, _grid_step(x, 8))


# ---------------------------------------------------------------------------
# Weights (int_quantizer.py:453-476 + manager correction :374-393)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize('bits,bit_alloc', [(8, False), (4, False), (4, True)])
def test_weight_per_channel(bits, bit_alloc):
    w = _weight(seed=40)
    q = make_ref_quantizer(f'int{bits}', pcq_weights=True,
                           bit_alloc_weight=bit_alloc)
    want = q(torch.from_numpy(w.copy()), 'id', 'weight').numpy()

    cfg = QuantConfig(num_bits=bits, pcq_w=True, bit_alloc_weight=bit_alloc)
    got, _ = quantize_weight(jnp.asarray(w), cfg, out_axis=0)
    flat = w.reshape(w.shape[0], -1)
    step = (flat.max(axis=-1) - flat.min(axis=-1)).max()
    assert_quant_parity(want, got, step)


def test_weight_per_tensor():
    w = _weight(seed=41)
    q = make_ref_quantizer('int8')
    want = q(torch.from_numpy(w.copy()), 'id', 'weight').numpy()
    got, _ = quantize_weight(jnp.asarray(w), QuantConfig(num_bits=8), out_axis=0)
    assert_quant_parity(want, got, _grid_step(w, 8))


@pytest.mark.parametrize('bcorr,vcorr', [(True, False), (False, True), (True, True)])
def test_weight_bias_var_correction(bcorr, vcorr):
    """Replicates the manager's correction block
    (inference_quantization_manager.py:374-391) on top of pcq_w int4."""
    w = _weight(seed=42)
    wt = torch.from_numpy(w.copy())
    q = make_ref_quantizer('int4', pcq_weights=True, bit_alloc_weight=True)
    weight_q = q(wt, 'id', 'weight')

    bias_q = weight_q.view(weight_q.shape[0], -1).mean(-1).view(-1, 1, 1, 1)
    bias_orig = wt.view(wt.shape[0], -1).mean(-1).view(-1, 1, 1, 1)
    want = weight_q.clone()
    if vcorr:
        eps = torch.tensor([1e-8])
        var_corr = (wt.view(wt.shape[0], -1).std(dim=-1)
                    / (weight_q.view(weight_q.shape[0], -1).std(dim=-1) + eps))
        want = (want - bias_q) * var_corr.view(-1, 1, 1, 1) + bias_q
    if bcorr:
        want = want - bias_q + bias_orig
    want = want.numpy()

    cfg = QuantConfig(num_bits=4, pcq_w=True, bit_alloc_weight=True)
    wq, _ = quantize_weight(jnp.asarray(w), cfg, out_axis=0)
    got = weight_correction(jnp.asarray(w), wq, out_axis=0,
                            bias_corr=bcorr, var_corr=vcorr)
    flat = w.reshape(w.shape[0], -1)
    step = (flat.max(axis=-1) - flat.min(axis=-1)).max()
    assert_quant_parity(want, got, step)


def test_activation_bias_correction():
    """Replicates the conv activation bias-correction block
    (inference_quantization_manager.py:188-196)."""
    out = torch.from_numpy(_act4d(seed=43))
    out_q_np = _act4d(seed=43) + RNG.normal(0, 0.05, out.shape).astype(np.float32)
    out_q = torch.from_numpy(out_q_np.copy())

    relu_out = torch.nn.functional.relu(out)
    temp = relu_out.transpose(0, 1).contiguous().view(out.shape[1], -1)
    q_bias = temp.sum(-1) - out_q.transpose(0, 1).contiguous().view(out.shape[1], -1).sum(-1)
    count = (temp > 0).sum(-1).type(q_bias.dtype)
    q_bias = q_bias / (count + torch.tensor([1e-8]))
    want = (out_q + (out_q > 0).type(out_q.dtype)
            * q_bias.view(1, -1, 1, 1)).numpy()

    got = activation_bias_correction(jnp.asarray(out.numpy()),
                                     jnp.asarray(out_q_np), channel_axis=1,
                                     pre_relu=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Mid-tread (int_quantizer.py:147-225)
# ---------------------------------------------------------------------------

def test_mid_tread_weights_per_channel():
    w = _weight(seed=50)
    q = make_ref_quantizer('int4', mtd_quant=True, pcq_weights=True,
                           bit_alloc_target_weight=4)
    want = q(torch.from_numpy(w.copy()), 'id', 'weight').numpy()

    cfg = QuantConfig(num_bits=4, pcq_w=True, mtd_quant=True,
                      bit_alloc_target_weight=4)
    got, _ = quantize_weight(jnp.asarray(w), cfg, out_axis=0)
    flat = w.reshape(w.shape[0], -1)
    step = (flat.max(axis=-1) - flat.min(axis=-1)).max()
    assert_quant_parity(want, got, step)


@pytest.mark.parametrize('half_range', [False, True])
def test_mid_tread_activation_per_tensor(half_range):
    x = _act2d(n=8, m=256, seed=51).reshape(8, 256)
    q = make_ref_quantizer('int4', mtd_quant=True, clipping='laplace',
                           bit_alloc_target_act=5.3)
    q.half_range = half_range
    want = q(torch.from_numpy(x.copy()), 'id', 'activation').numpy()

    cfg = QuantConfig(num_bits=4, mtd_quant=True, clipping='laplace',
                      bit_alloc_target_act=5.3)
    got, _ = quantize_activation(jnp.asarray(x), cfg, half_range=half_range,
                                 channel_axis=1)
    step = float(x.max() - x.min())
    assert_quant_parity(want, got, step, frac=0.998)


def test_mid_tread_activation_per_channel():
    x = _act4d(seed=52)
    q = make_ref_quantizer('int4', mtd_quant=True, clipping='laplace',
                           pcq_act=True, bit_alloc_target_act=5.3)
    want = q(torch.from_numpy(x.copy()), 'id', 'activation').numpy()

    cfg = QuantConfig(num_bits=4, mtd_quant=True, clipping='laplace',
                      pcq_a=True, bit_alloc_target_act=5.3)
    got, _ = quantize_activation(jnp.asarray(x), cfg, channel_axis=1)
    step = (x.max(axis=(0, 2, 3)) - x.min(axis=(0, 2, 3))).max()
    assert_quant_parity(want, got, step, frac=0.998)
