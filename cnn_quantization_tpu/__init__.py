"""cnn_quantization_tpu — TPU-native post-training quantized-inference engine.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the ACIQ
reference implementation (NeurIPS 2019, "Post-training 4-bit quantization of
convolution networks for rapid-deployment"):

  * GEMMLOWP-style affine fake-quantization (scale + zero-point), per-tensor
    and per-channel, with per-channel bit widths.
  * ACIQ analytical clipping (Laplace / Gaussian priors, half-range variants).
  * Per-channel bit allocation under a bit budget (sigma^(2/3) rule).
  * Weight bias / variance correction; activation bias correction.
  * Offline calibration statistics as pytree artifacts.
  * Mid-tread quantization with bin allocation + entropy (rate) measurement.
  * Flax CNN model zoo (ResNet / VGG / Inception / MobileNet ...) with
    BN folding at parameter-load time.
  * Multi-device evaluation via jax.sharding.Mesh + collectives.

Design stance (vs the reference's architecture): no monkeypatching, no
singletons, no mutable quantizer objects.  Quantization is a declarative
policy (QuantPolicy) resolved per quantization site; quantization parameters
are pytrees; the quantized forward pass is a single jitted function.
"""

__version__ = "0.1.0"
