"""Benchmark: ResNet-50 W4A4 quantized-inference throughput on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no throughput numbers (SURVEY.md §6), so
``vs_baseline`` is the quantized-vs-FP32 throughput ratio on the same chip —
the fake-quant overhead factor (1.0 = free quantization; the reference's
Python/CUDA fake-quant path is far below 1).
"""

import json
import os
import sys
import time

import numpy as np


def bench(arch='resnet50', batch=64, steps=10, dtype='bfloat16'):
    import jax
    import jax.numpy as jnp
    from cnn_quantization_tpu.models import build_model
    from cnn_quantization_tpu.engine import QuantPolicy, QuantEngine, TapContext

    model, meta = build_model(arch, dtype=dtype)
    x = jnp.zeros((batch, 224, 224, 3), jnp.float32)
    params = jax.jit(lambda k: model.init(k, x, TapContext())['params'])(
        jax.random.PRNGKey(0))

    policy = QuantPolicy(qtype='int4', qweight='int4', pcq_weights=True,
                         pcq_act=True, clipping='laplace', bit_alloc_act=True,
                         bit_alloc_weight=True, bias_corr_weight=True, arch=arch)
    eng = QuantEngine(model, policy, meta)
    pq = eng.quantize_params(params)

    images = jnp.asarray(np.random.RandomState(0).rand(batch, 224, 224, 3)
                         .astype(np.float32))

    def timed(fwd, p):
        out, _ = fwd(p, None, images)
        jax.block_until_ready(out)          # compile + warmup
        t0 = time.perf_counter()
        for _ in range(steps):
            out, _ = fwd(p, None, images)
        jax.block_until_ready(out)
        return batch * steps / (time.perf_counter() - t0)

    ips_q = timed(eng.jit_forward(quantized=True), pq)
    ips_fp = timed(eng.jit_forward(quantized=False), params)
    return ips_q, ips_fp


def main():
    batch = int(os.environ.get('BENCH_BATCH', '64'))
    steps = int(os.environ.get('BENCH_STEPS', '10'))
    try:
        ips_q, ips_fp = bench(batch=batch, steps=steps)
        print(json.dumps({
            'metric': 'resnet50_w4a4_images_per_sec_per_chip',
            'value': round(ips_q, 2),
            'unit': 'images/sec',
            'vs_baseline': round(ips_q / ips_fp, 4),
        }))
    except Exception as e:  # noqa: BLE001 — bench must always emit a line
        print(json.dumps({
            'metric': 'resnet50_w4a4_images_per_sec_per_chip',
            'value': 0.0,
            'unit': 'images/sec',
            'vs_baseline': 0.0,
            'error': f'{type(e).__name__}: {e}',
        }))
        sys.exit(1)


if __name__ == '__main__':
    main()
