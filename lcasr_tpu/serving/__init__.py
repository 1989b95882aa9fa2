from lcasr_tpu.serving.transcriber import OnlineTranscriber  # noqa: F401
from lcasr_tpu.serving.server import TranscriptionServer  # noqa: F401
