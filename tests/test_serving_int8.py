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
    rel = float(jnp.linalg.norm(l_int - l_fp) / jnp.linalg.norm(l_fp))
    assert rel < 0.05, rel
    assert bool((jnp.argmax(l_int, -1) == jnp.argmax(l_fp, -1)).all())
