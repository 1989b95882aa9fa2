from lcasr_tpu.data.tokenizer import SentencePieceBPE, load_tokenizer  # noqa: F401
