"""Model registry: arch name -> (Flax module, ModelMeta).

Covers the reference's evaluated zoo (inference/inference_sim.py:45-50,
114-125): resnets, vggs, alexnet, squeezenet, inception_v3, mobilenet_v2.
"""

from __future__ import annotations

from ..engine.engine import ModelMeta

# archs the reference BN-folds: ``'resnet' in arch or vgg16_bn or
# inception_v3`` (inference_sim.py:179-182) — note resnext* does NOT contain
# 'resnet' so it is neither folded nor before-relu marked, while wide_resnet*
# is both.
_FOLDED = ('resnet18', 'resnet34', 'resnet50', 'resnet101', 'resnet152',
           'wide_resnet50_2', 'wide_resnet101_2',
           'vgg16_bn', 'vgg11_bn', 'vgg13_bn', 'vgg19_bn', 'inception_v3')

_RESNET_FAMILY = ('resnet', 'resnext', 'wide_resnet')


def build_model(arch: str, fold_bn: bool | None = None, num_classes: int = 1000,
                dtype: str = 'float32'):
    if fold_bn is None:
        fold_bn = arch in _FOLDED
    if arch.startswith(_RESNET_FAMILY):
        from .resnet import build_resnet
        model = build_resnet(arch, fold_bn=fold_bn, num_classes=num_classes, dtype=dtype)
        return model, ModelMeta(arch=arch, fold_bn=fold_bn)
    if arch.startswith('vgg'):
        from .vgg import build_vgg
        model = build_vgg(arch, fold_bn=fold_bn, num_classes=num_classes)
        return model, ModelMeta(arch=arch, fold_bn=fold_bn)
    if arch == 'alexnet':
        from .alexnet import build_alexnet
        return build_alexnet(num_classes), ModelMeta(arch=arch, fold_bn=False)
    if arch.startswith('squeezenet'):
        from .squeezenet import build_squeezenet
        return build_squeezenet(arch, num_classes), ModelMeta(arch=arch, fold_bn=False)
    if arch == 'inception_v3':
        from .inception import build_inception_v3
        model = build_inception_v3(num_classes, fold_bn=fold_bn)
        return model, ModelMeta(
            arch=arch, fold_bn=fold_bn, input_size=299,
            eight_bit_weight_names=('Conv2d_1a_3x3', 'Conv2d_2a_3x3'))
    if arch.startswith('densenet'):
        from .densenet import build_densenet
        return build_densenet(arch, num_classes), ModelMeta(arch=arch, fold_bn=False)
    if arch == 'googlenet':
        from .googlenet import build_googlenet
        return build_googlenet(num_classes), ModelMeta(arch=arch, fold_bn=False)
    if arch == 'shufflenet':
        from .shufflenet import build_shufflenet
        return build_shufflenet(groups=8, num_classes=num_classes), ModelMeta(
            arch=arch, fold_bn=False)
    if arch == 'mobilenet_v2' or arch == 'mobilenetv2':
        from .mobilenetv2 import build_mobilenet_v2
        model = build_mobilenet_v2(num_classes, fold_bn=fold_bn)
        return model, ModelMeta(arch='mobilenet_v2', fold_bn=fold_bn)
    raise ValueError(f'unknown arch {arch!r}')


def available_archs():
    return ('resnet18', 'resnet34', 'resnet50', 'resnet101', 'resnet152',
            'resnext50_32x4d', 'resnext101_32x8d',
            'wide_resnet50_2', 'wide_resnet101_2',
            'vgg11', 'vgg13', 'vgg16', 'vgg19', 'vgg16_bn', 'alexnet',
            'squeezenet1_0', 'squeezenet1_1', 'inception_v3', 'mobilenet_v2',
            'densenet121', 'densenet161', 'densenet169', 'densenet201',
            'googlenet', 'shufflenet')
