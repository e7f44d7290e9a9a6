"""Streaming incremental transcription: partials grow, finalize matches
the non-streaming path."""

import numpy as np
import pytest

from janus_tpu.runtime.streaming import StreamingTranscriber, merge_transcripts


def test_merge_transcripts():
    assert merge_transcripts("", "alpha bravo") == "alpha bravo"
    assert merge_transcripts("alpha bravo", "") == "alpha bravo"
    assert merge_transcripts("alpha bravo", "bravo charlie") == "alpha bravo charlie"
    assert merge_transcripts("a b c", "b c d e") == "a b c d e"
    assert merge_transcripts("alpha", "delta") == "alpha delta"  # no overlap
    assert merge_transcripts("a b", "a b") == "a b"  # full overlap


class CountingEncoder:
    """Deterministic fake: 'transcribes' sample count into words."""

    def encode_batch(self, phrases):
        out = []
        for p in phrases:
            n_words = len(p) // 48_000  # one word per second
            out.append({"text": " ".join(f"w{i}" for i in range(n_words)),
                        "prosody": {"energy": "Normal", "pitch": "Normal"}})
        return out


def test_streaming_partials_grow_and_finalize():
    st = StreamingTranscriber(CountingEncoder(), window_seconds=4.0,
                              stride_seconds=1.0)
    chunk = np.zeros(48_000 // 2, np.float32)  # 0.5 s chunks
    partials = []
    for _ in range(12):  # 6 s of audio
        r = st.push(chunk)
        if r is not None:
            partials.append(r)
    assert partials  # stride boundaries produced updates
    assert len(partials[-1].split()) >= len(partials[0].split())
    final = st.finalize()
    assert final == " ".join(f"w{i}" for i in range(6))
    assert st.partial == ""  # reset


def test_streaming_short_phrase_equivalence():
    st = StreamingTranscriber(CountingEncoder(), window_seconds=8.0,
                              stride_seconds=1.0)
    chunk = np.zeros(48_000, np.float32)
    for _ in range(3):
        st.push(chunk)
    assert st.finalize() == "w0 w1 w2"
