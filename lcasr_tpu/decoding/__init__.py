from lcasr_tpu.decoding.greedy import GreedyCTCDecoder  # noqa: F401
