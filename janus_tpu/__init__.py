"""janus_tpu — a TPU-native semantic audio codec framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the Janus
semantic audio codec (reference: akshatvasisht/janus): speech is compressed
to ~300 bps by transcribing it with an in-house Whisper-class encoder/decoder,
extracting prosody with fused YIN pitch + RMS energy kernels, and packing
``{text, mode, prosody, emotion}`` into a bit-exact MessagePack packet; the
receive side reconstructs natural speech with an LLM-conditioned TTS
transformer and an iSTFT-head generative vocoder, all under ``jit`` with
KV-cached autoregressive sampling, sharded over multi-chip device meshes.

Subpackages
-----------
- ``janus_tpu.common``   — wire protocol, control state, typed config
- ``janus_tpu.audio``    — WAV I/O, synthetic signal generators, audio services
- ``janus_tpu.ops``      — JAX/Pallas DSP + NN kernels (mel, YIN, attention, ...)
- ``janus_tpu.models``   — ASR (Whisper-class), VAD, TTS, vocoder, tokenizer
- ``janus_tpu.parallel`` — mesh / sharding rules / ring attention / Ulysses
- ``janus_tpu.train``    — losses and pjit-sharded train steps
- ``janus_tpu.runtime``  — session engine, segmentation, 300 bps link transport
- ``janus_tpu.api``      — WebSocket + REST control plane
"""

__version__ = "0.1.0"

from janus_tpu.common.protocol import JanusMode, JanusPacket  # noqa: F401
