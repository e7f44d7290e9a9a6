"""Training: losses and mesh-sharded train steps."""

from janus_tpu.train.losses import asr_loss, tts_loss, vad_loss  # noqa: F401
from janus_tpu.train.trainer import Trainer, TrainState  # noqa: F401
