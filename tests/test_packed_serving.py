"""W4A4 packed serving: end-to-end equivalence vs the plain serving path.

The packed path (models/resnet.py Bottleneck + ops/kernels/int4_matmul.py)
computes the SAME math as the plain int8-resident W4A4 serving forward when
both use scales frozen with ``packed=True``: conv inputs quantize at the
same frozen scales with the same +/-7 grid, the residual is dequantized and
added in f32 before the ReLU either way, and block boundaries carry codes
at the next block's input scale.  Differences are f32 summation-order
rounding at requant boundaries (code flips), so logits agree to a few
percent and intermediate code tensors almost everywhere.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cnn_quantization_tpu.models import build_model
from cnn_quantization_tpu.engine import QuantEngine, QuantPolicy, TapContext


@pytest.fixture(scope='module')
def served():
    model, meta = build_model('resnet50')
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    params = jax.jit(lambda k: model.init(k, x0, TapContext())['params'])(
        jax.random.PRNGKey(0))
    policy = QuantPolicy(qtype='int4', qweight='int4', arch='resnet50')
    eng = QuantEngine(model, policy, meta)
    pq = eng.quantize_params(params)
    sp = eng.prepare_serving_params(pq)
    rng = np.random.RandomState(0)
    cal = [(rng.rand(2, 64, 64, 3).astype(np.float32), np.zeros(2, np.int32))]
    scales = eng.freeze_serving_scales(sp, cal, packed=True)
    return eng, sp, scales, rng.rand(2, 64, 64, 3).astype(np.float32)


def test_packed_scales_cover_trunk(served):
    eng, sp, scales, x = served
    # every trunk site the packed path needs must have been frozen
    conv_sites = [k for k in scales if k.startswith('conv')]
    assert len(conv_sites) >= 53
    assert any(k.endswith(':out') for k in scales)
    # packed freeze emits BOTH grids: plain ':out' (int8, used by fallback
    # archs) and ':out:packed' (int4 grid, required by the packed trunk)
    outs = [k for k in scales if k.endswith(':out')]
    for k in outs:
        assert k + ':packed' in scales
        # int4 grid step is (127/7)x coarser for the same calibrated clip
        np.testing.assert_allclose(scales[k + ':packed'],
                                   scales[k] * 127.0 / 7.0, rtol=1e-6)


def test_packed_forward_matches_plain(served):
    """Eager-vs-eager the two paths are BIT-EXACT (measured rel 0.0): the
    packed path's quantize/dequant/residual math is the plain path's,
    rearranged into Pallas epilogues.  (Under jit the comparison is
    meaningless: XLA fusion changes f32 rounding, and with +/-7 grids over
    53 sites on random weights even plain-jit vs plain-eager diverges ~25%
    — pure code-flip chaos, measured round 4.)"""
    eng, sp, scales, x = served
    # the shipping plain path keeps ':out' identity codes on the full int8
    # grid while the packed path stores them at ±7; for the bit-exactness
    # comparison, hand the plain path the packed-grid scales (step
    # absmax/7, its ±127 clip is then a no-op) so both paths compute the
    # identical identity quantization
    cmp_scales = {k: (scales[k + ':packed'] if k + ':packed' in scales
                      else v)
                  for k, v in scales.items()}
    fwd_plain = eng.make_forward(quantized='serving_int8',
                                 act_scales=cmp_scales)
    fwd_packed = eng.make_forward(quantized='serving_int8',
                                  act_scales=scales, packed=True)
    lp, _ = fwd_plain(sp, None, jnp.asarray(x))
    lk, _ = fwd_packed(sp, None, jnp.asarray(x))
    lp, lk = np.asarray(lp), np.asarray(lk)
    assert np.isfinite(lk).all()
    np.testing.assert_allclose(lk, lp, rtol=1e-5, atol=1e-5)

    # and the jitted packed forward must at least run and stay finite
    fj = jax.jit(eng.make_forward(quantized='serving_int8',
                                  act_scales=scales, packed=True))
    lj, _ = fj(sp, None, jnp.asarray(x))
    assert np.isfinite(np.asarray(lj)).all()


def test_packed_falls_back_without_scales(served):
    """Missing packed ':out:packed' scales -> the model must silently use
    the plain path (all-or-nothing guard in ResNet.__call__), not crash."""
    eng, sp, scales, x = served
    partial = {k: v for k, v in scales.items()
               if not k.endswith(':out:packed')}
    fwd = jax.jit(eng.make_forward(quantized='serving_int8',
                                   act_scales=partial, packed=True))
    logits, _ = fwd(sp, None, jnp.asarray(x))
    assert np.isfinite(np.asarray(logits)).all()


def test_plain_frozen_scales_never_engage_packed(served):
    """Provenance guard (ADVICE r4 medium): make_forward(packed=True) with
    scales frozen packed=False must produce the IDENTICAL graph to the plain
    path — the ':out:packed' keys the packed trunk requires don't exist, so
    the all-or-nothing guard falls back instead of running the ±7 Pallas
    epilogue on int8-grid ':out' scales (silently crushed residuals)."""
    eng, sp, _scales, x = served
    rng = np.random.RandomState(3)
    cal = [(rng.rand(2, 64, 64, 3).astype(np.float32), np.zeros(2, np.int32))]
    plain_scales = eng.freeze_serving_scales(sp, cal, packed=False)
    assert not any(k.endswith(':out:packed') for k in plain_scales)
    la, _ = jax.jit(eng.make_forward(quantized='serving_int8',
                                     act_scales=plain_scales))(
        sp, None, jnp.asarray(x))
    lb, _ = jax.jit(eng.make_forward(quantized='serving_int8',
                                     act_scales=plain_scales, packed=True))(
        sp, None, jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_basicblock_arch_ignores_packed():
    """BasicBlock trunks (3x3 convs) cannot pack; packed=True must be a
    no-op for resnet18."""
    model, meta = build_model('resnet18')
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    params = jax.jit(lambda k: model.init(k, x0, TapContext())['params'])(
        jax.random.PRNGKey(1))
    policy = QuantPolicy(qtype='int4', qweight='int4', arch='resnet18')
    eng = QuantEngine(model, policy, meta)
    sp = eng.prepare_serving_params(eng.quantize_params(params))
    rng = np.random.RandomState(1)
    cal = [(rng.rand(2, 64, 64, 3).astype(np.float32), np.zeros(2, np.int32))]
    scales = eng.freeze_serving_scales(sp, cal, packed=True)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    la, _ = jax.jit(eng.make_forward(quantized='serving_int8',
                                     act_scales=scales))(sp, None, x)
    lb, _ = jax.jit(eng.make_forward(quantized='serving_int8',
                                     act_scales=scales, packed=True))(
        sp, None, x)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_unfolded_bottleneck_arch_ignores_packed():
    """resnext50 is a Bottleneck trunk but is NOT BN-folded (no 'resnet'
    substring — inference_sim.py:175-182), and the packed path requires
    folded serving params; packed=True must fall back to the identical
    plain graph."""
    model, meta = build_model('resnext50_32x4d')
    assert not meta.fold_bn
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    params = jax.jit(lambda k: model.init(k, x0, TapContext())['params'])(
        jax.random.PRNGKey(2))
    policy = QuantPolicy(qtype='int4', qweight='int4', arch='resnext50_32x4d')
    eng = QuantEngine(model, policy, meta)
    sp = eng.prepare_serving_params(eng.quantize_params(params))
    rng = np.random.RandomState(2)
    cal = [(rng.rand(2, 64, 64, 3).astype(np.float32), np.zeros(2, np.int32))]
    scales = eng.freeze_serving_scales(sp, cal, packed=True)
    x = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    la, _ = jax.jit(eng.make_forward(quantized='serving_int8',
                                     act_scales=scales))(sp, None, x)
    lb, _ = jax.jit(eng.make_forward(quantized='serving_int8',
                                     act_scales=scales, packed=True))(
        sp, None, x)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_packed_stage_selection(served):
    """ctx.packed may be a tuple of 1-based stage indices: only those
    stages run the Pallas orchestration, the rest use the plain int8-
    resident path with int8 codes at the zone boundary (round-5 friction
    ablation machinery; also reachable via --serving_packed_stages)."""
    eng, sp, scales, x = served
    for stages in [(1,), (2, 3), (4,)]:
        fwd = jax.jit(eng.make_forward(quantized='serving_int8',
                                       act_scales=scales, packed=stages))
        logits, _ = fwd(sp, None, jnp.asarray(x))
        assert np.isfinite(np.asarray(logits)).all(), stages
    # full tuple == packed=True, identical graphs eagerly
    fa = eng.make_forward(quantized='serving_int8', act_scales=scales,
                          packed=True)
    fb = eng.make_forward(quantized='serving_int8', act_scales=scales,
                          packed=(1, 2, 3, 4))
    la, _ = fa(sp, None, jnp.asarray(x))
    lb, _ = fb(sp, None, jnp.asarray(x))
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
