"""Model zoo smoke tests: shapes, param counts, site numbering parity."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from cnn_quantization_tpu.models import build_model, available_archs
from cnn_quantization_tpu.engine import TapContext
from cnn_quantization_tpu.engine.qparams import discover_sites

# (arch, test input size, expected param count (1e6), expected conv sites,
#  expected classifier linear id) — param counts match torchvision
CASES = [
    ('resnet18', 64, 11.68, 20, 'linear0_activation'),
    ('resnet50', 64, 25.55, 53, 'linear0_activation'),
    # resnext is unfolded (no 'resnet' substring -> no BN fold), so params
    # include BN mean/var; wide_resnet folds (inference_sim.py:179-182)
    ('resnext50_32x4d', 64, 25.10, 53, 'linear0_activation'),
    ('wide_resnet50_2', 64, 68.85, 53, 'linear0_activation'),
    ('vgg16', 64, None, 13, 'linear2_activation'),
    ('alexnet', 224, 61.10, 5, 'linear2_activation'),
    ('squeezenet1_0', 224, 1.25, 26, None),
    ('squeezenet1_1', 224, 1.24, 26, None),
    ('mobilenet_v2', 96, 3.54, 52, 'linear0_activation'),
]


@pytest.mark.parametrize('arch,size,mparams,nconvs,cls_id', CASES)
def test_model_builds_and_numbers_sites(arch, size, mparams, nconvs, cls_id):
    model, meta = build_model(arch)
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    params = jax.eval_shape(
        lambda k: model.init(k, x, TapContext())['params'], jax.random.PRNGKey(0))
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))
    if mparams is not None:
        assert abs(n / 1e6 - mparams) < 0.05, n
    sites = discover_sites(model, (1, size, size, 3))
    convs = [s.id for s, _ in sites if s.id.startswith('conv')]
    assert len(convs) == nconvs, convs
    if cls_id is not None:
        tags = {s.id: s.tag for s, _ in sites}
        assert tags.get(cls_id) == 'activation_classifier'


def test_inception_v3_numbering():
    model, meta = build_model('inception_v3')
    assert meta.input_size == 299
    assert meta.eight_bit_weight_names == ('Conv2d_1a_3x3', 'Conv2d_2a_3x3')
    sites = discover_sites(model, (1, 299, 299, 3))
    convs = sorted(int(s.id[4:].split('_')[0]) for s, _ in sites
                   if s.id.startswith('conv'))
    # 94 executed convs; ids reach conv95 because the aux tower consumes two
    assert len(convs) == 94 and convs[-1] == 95
    lins = [s.id for s, _ in sites if s.id.startswith('linear')]
    assert lins == ['linear1_activation']  # aux fc took linear0


def test_squeezenet_classifier_conv_tag():
    model, _ = build_model('squeezenet1_1')
    sites = discover_sites(model, (1, 224, 224, 3))
    cls = [s for s, _ in sites if s.tag == 'activation_classifier']
    assert any(s.kind == 'conv' for s in cls)  # 1000-ch conv classifier
