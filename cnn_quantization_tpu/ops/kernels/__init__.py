from .fake_quant import fake_quant_fused
