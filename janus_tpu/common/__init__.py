from janus_tpu.common.protocol import JanusMode, JanusPacket  # noqa: F401
from janus_tpu.common.config import JanusConfig  # noqa: F401
