from lcasr_tpu.ops.norms import LayerNorm, RMSNorm, get_norm  # noqa: F401
from lcasr_tpu.ops.rotary import RotaryEmbedding, apply_rotary  # noqa: F401
