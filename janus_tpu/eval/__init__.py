"""Evaluation harnesses: WER, SNR, prosody correlation, RTF counters."""

from janus_tpu.eval.metrics import (  # noqa: F401
    character_error_rate,
    prosody_agreement,
    snr_db,
    word_error_rate,
)
