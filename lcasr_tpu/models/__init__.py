from lcasr_tpu.models.sconformer_xl import SCConformerXL  # noqa: F401
from lcasr_tpu.models.registry import get_model_class, load_model  # noqa: F401
