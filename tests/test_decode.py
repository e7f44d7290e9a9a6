"""Upload decode: WAV / WebM-Opus / Ogg-Opus, first-party (no FFmpeg).

The reference accepted browser voice-clone clips (audio/webm;codecs=opus,
reference: frontend/components/VoiceCloner.tsx:61-63) by delegating to
FFmpeg (reference: backend/services/transcriber.py:66-91). Here the whole
path is first-party: ctypes libopus + pure-Python Ogg/EBML demuxers.
Fixtures are built with the same libopus encoder + our muxers, shaped
like MediaRecorder output (unknown-size Segment/Cluster vints).
"""

import struct

import numpy as np
import pytest

from janus_tpu.audio.decode import read_audio, sniff_format
from janus_tpu.audio.ogg import demux_ogg_opus, mux_ogg_opus, ogg_packets
from janus_tpu.audio.opus import (
    OpusDecoder,
    OpusEncoder,
    build_opus_head,
    opus_available,
    parse_opus_head,
)
from janus_tpu.audio.synthetic import voiced_phrase
from janus_tpu.audio.webm import demux_webm_opus, mux_webm_opus

pytestmark = pytest.mark.skipif(
    not opus_available(), reason="libopus not present on this host"
)

SR = 48_000


@pytest.fixture(scope="module")
def clip():
    """A 1.5 s voiced phrase and its Opus packets + pre-skip."""
    pcm = np.asarray(voiced_phrase(seconds=1.5), dtype=np.float32)
    enc = OpusEncoder()
    packets = enc.encode(pcm)
    pre = enc.lookahead
    enc.close()
    return pcm, packets, pre


def _corr(a, b):
    n = min(len(a), len(b))
    a, b = a[:n], b[:n]
    return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-9))


def test_opus_packet_roundtrip(clip):
    pcm, packets, pre = clip
    dec = OpusDecoder(channels=1)
    out = dec.decode_stream(packets, pre_skip=pre)
    dec.close()
    # length = padded-to-20ms input, minus the trimmed lookahead
    padded = len(packets) * OpusEncoder.FRAME_SAMPLES
    assert len(out) == padded - pre
    assert _corr(out, pcm) > 0.8


def test_opus_head_fields_roundtrip():
    head = parse_opus_head(build_opus_head(channels=2, pre_skip=312))
    assert head["channels"] == 2
    assert head["pre_skip"] == 312
    assert head["mapping_family"] == 0
    with pytest.raises(ValueError):
        parse_opus_head(b"NotOpus!" + b"\x00" * 16)


def test_ogg_mux_demux(clip):
    pcm, packets, pre = clip
    blob = mux_ogg_opus(packets, pre)
    assert sniff_format(blob) == "ogg"
    head, out_packets = demux_ogg_opus(blob)
    assert head["pre_skip"] == pre
    assert out_packets == packets
    audio, sr = read_audio(blob)
    assert sr == SR
    assert _corr(audio, pcm) > 0.8


def test_ogg_packet_spanning_pages(clip):
    """A >255*n byte packet is laced across segments and reassembled."""
    big = bytes(range(256)) * 3  # 768 bytes -> 3 full lacing values + tail
    blob = mux_ogg_opus([big], pre_skip=0)
    pkts = [p for _, p in ogg_packets(blob)]
    assert big in pkts


def test_webm_mux_demux_mediarecorder_shape(clip):
    """Unknown-size Segment + Cluster vints, as MediaRecorder streams."""
    pcm, packets, pre = clip
    blob = mux_webm_opus(packets, pre, unknown_size_segment=True)
    assert sniff_format(blob) == "webm"
    info, out_packets = demux_webm_opus(blob)
    assert info["pre_skip"] == pre
    assert info["channels"] == 1
    assert out_packets == packets
    audio, sr = read_audio(blob)
    assert sr == SR
    assert _corr(audio, pcm) > 0.8


def test_webm_sized_segment(clip):
    pcm, packets, pre = clip
    blob = mux_webm_opus(packets, pre, unknown_size_segment=False)
    _info, out_packets = demux_webm_opus(blob)
    assert out_packets == packets


def test_webm_truncated_recording(clip):
    """A clip cut off mid-cluster (browser tab closed) still decodes."""
    pcm, packets, pre = clip
    blob = mux_webm_opus(packets, pre, unknown_size_segment=True)
    cut = blob[: len(blob) * 2 // 3]
    _info, out_packets = demux_webm_opus(cut)
    assert 0 < len(out_packets) < len(packets)
    prefix = packets[: len(out_packets)]
    assert out_packets == prefix


def test_webm_codec_delay_fallback(clip):
    """pre_skip falls back to CodecDelay when CodecPrivate is absent."""
    pcm, packets, pre = clip
    blob = mux_webm_opus(packets, pre)
    # Excise the CodecPrivate element (OpusHead) so the demuxer must use
    # the CodecDelay ns field instead.
    head = build_opus_head(1, pre)
    priv = b"\x63\xa2" + bytes([0x80 | len(head)]) + head
    assert priv in blob
    blob2 = blob.replace(priv, b"\xec" + bytes([0x80 | len(head)]) + head)  # Void element
    info, _ = demux_webm_opus(blob2)
    assert info["pre_skip"] == pre  # ns -> samples conversion is exact here


def test_wav_passthrough(tmp_path):
    from janus_tpu.audio.wav import write_wav

    pcm = np.asarray(voiced_phrase(seconds=0.3), dtype=np.float32)
    p = tmp_path / "x.wav"
    write_wav(str(p), pcm, SR)
    audio, sr = read_audio(str(p))
    assert sr == SR
    assert _corr(audio, pcm) > 0.99


def test_unknown_container_rejected():
    with pytest.raises(ValueError):
        read_audio(b"\x00" * 64)


def test_webm_xiph_lacing(clip):
    """Hand-built SimpleBlock with Xiph lacing (3 frames in one block)."""
    pcm, packets, pre = clip
    frames = packets[:3]
    # vint track 1, timecode 0, flags: keyframe | xiph lacing (0x02<<1)
    lace_sizes = b""
    for f in frames[:-1]:
        q, r = divmod(len(f), 255)
        lace_sizes += b"\xff" * q + bytes([r])
    block = (
        b"\x81" + struct.pack(">h", 0) + bytes([0x80 | 0x02])
        + bytes([len(frames) - 1]) + lace_sizes + b"".join(frames)
    )
    # Unknown-size Segment so the spliced file's length stays consistent.
    base = mux_webm_opus(packets[:1], pre, unknown_size_segment=True)
    info, out = demux_webm_opus(base)
    assert out == packets[:1]
    # Swap the cluster for one holding the laced block and demux it.
    from janus_tpu.audio import webm as W

    laced_cluster = W._elem(W._CLUSTER, W._elem(W._CLUSTER_TIMECODE, b"\x00")
                            + W._elem(W._SIMPLE_BLOCK, block))
    idx = base.find(b"\x1f\x43\xb6\x75")  # first (only) cluster
    blob = base[:idx] + laced_cluster
    info2, out2 = demux_webm_opus(blob)
    assert out2 == frames
