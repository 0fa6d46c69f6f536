"""onebit-tpu: TPU-native 1-bit (OneBit) LLM quantization framework.

JAX / XLA / Pallas / pjit re-implementation of the capabilities of
xuyuzhuang11/OneBit: sign-only weight quantization with SVID init, knowledge
distillation training, lossless bit packing, a fused Pallas inference kernel,
sharded multi-host execution, and a perplexity / zero-shot eval harness.
"""

__version__ = "0.1.0"

from onebit_tpu.core.bitlinear import bitlinear_fwd, sign_ste
from onebit_tpu.core.packing import (
    pack_signs,
    pack_signs_bitplane,
    unpack_signs,
    unpack_signs_bitplane,
)
from onebit_tpu.core.svid import svid
from onebit_tpu.kernels.bitlinear import BitLinearWeights, bitlinear_apply
from onebit_tpu.model.config import BitLlamaConfig

__all__ = [
    "bitlinear_fwd", "sign_ste", "pack_signs", "unpack_signs",
    "pack_signs_bitplane", "unpack_signs_bitplane", "svid",
    "BitLinearWeights", "bitlinear_apply", "BitLlamaConfig",
]
