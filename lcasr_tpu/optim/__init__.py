from lcasr_tpu.optim.madgrad import madgrad, mirror_madgrad  # noqa: F401
from lcasr_tpu.optim.scheduling import CosineLRScheduler, SequenceWarmupManager  # noqa: F401
from lcasr_tpu.optim.factory import load_optimizer  # noqa: F401
