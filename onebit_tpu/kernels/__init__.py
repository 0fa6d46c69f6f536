from onebit_tpu.kernels.bitlinear import bitlinear_apply, BitLinearWeights

__all__ = ["bitlinear_apply", "BitLinearWeights"]
