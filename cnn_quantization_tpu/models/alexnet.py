"""AlexNet (torchvision layout), NHWC Flax implementation.

Fused-relu arch in the reference (force_positive activations,
inference_quantization_manager.py:492).  No BN anywhere.
"""

from __future__ import annotations

import flax.linen as nn

from ..engine.context import TapContext
from .layers import QConv, QLinear, QMaxPool, SiteNamer, relu


class AlexNet(nn.Module):
    sites: tuple
    num_classes: int = 1000

    @nn.compact
    def __call__(self, x, ctx: TapContext):
        (c0, c1, c2, c3, c4), (m0, m1, m2), (l0, l1, l2) = self.sites
        x = relu(QConv(64, 11, 4, 2, site=c0, name='features_0')(x, ctx))
        x = QMaxPool(3, 2, site=m0, name='features_2')(x, ctx)
        x = relu(QConv(192, 5, 1, 2, site=c1, name='features_3')(x, ctx))
        x = QMaxPool(3, 2, site=m1, name='features_5')(x, ctx)
        x = relu(QConv(384, 3, 1, 1, site=c2, name='features_6')(x, ctx))
        x = relu(QConv(256, 3, 1, 1, site=c3, name='features_8')(x, ctx))
        x = relu(QConv(256, 3, 1, 1, site=c4, name='features_10')(x, ctx))
        x = QMaxPool(3, 2, site=m2, name='features_12')(x, ctx)
        x = x.reshape(x.shape[0], -1)
        x = relu(QLinear(4096, site=l0, name='classifier_1')(x, ctx))
        x = relu(QLinear(4096, site=l1, name='classifier_4')(x, ctx))
        x = QLinear(self.num_classes, site=l2, name='classifier_6')(x, ctx)
        return x


def build_alexnet(num_classes: int = 1000) -> AlexNet:
    n = SiteNamer()
    convs = tuple(n.conv() for _ in range(5))
    # torchvision constructs all features before classifier; pools are
    # interleaved with convs in construction order
    pools = (n.maxpool(), n.maxpool(), n.maxpool())
    linears = (n.linear(), n.linear(), n.linear(classifier=True))
    return AlexNet(sites=(convs, pools, linears), num_classes=num_classes)
