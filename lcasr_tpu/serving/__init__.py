from lcasr_tpu.serving.transcriber import OnlineTranscriber  # noqa: F401
