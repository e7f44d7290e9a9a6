"""Model zoo: Whisper-class ASR, VAD, LLM-conditioned TTS, vocoder."""
