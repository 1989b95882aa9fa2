"""lcasr_tpu — a TPU-native (JAX / XLA / Pallas / pjit) long-context ASR framework.

A from-scratch rebuild of the capabilities of robflynnyh/long-context-asr
(Interspeech 2024, arXiv:2310.15672): CTC conformer acoustic models trained on
unsegmented long-form audio with sequence-length warmup, evaluated with
overlapping-chunk streaming decodes at contexts up to 1 hour.

Design is TPU-first:
  * models are pure-functional flax modules compiled with jit/pjit,
  * the hot attention path is a Pallas flash-attention kernel (segment-masked,
    optionally windowed, rotary fused),
  * parallelism is expressed as a `jax.sharding.Mesh` (data / model / sequence
    axes) with XLA collectives over ICI — not translated NCCL calls,
  * variable sequence length is handled by bucketed padding + length masks
    (XLA static shapes) instead of dynamic shapes.
"""

__version__ = "0.1.0"
