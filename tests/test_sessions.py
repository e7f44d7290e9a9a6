"""Batched multi-session runtime: concurrent sessions through one encoder
(BASELINE config 4 in miniature)."""

import numpy as np
import pytest

from janus_tpu.audio.synthetic import conversation, voiced_phrase
from janus_tpu.common.config import JanusConfig
from janus_tpu.runtime.codec import SemanticEncoder
from janus_tpu.runtime.profiling import StageTimer, trace
from janus_tpu.runtime.sessions import SessionManager


@pytest.fixture(scope="module")
def manager():
    cfg = JanusConfig().override(**{
        "asr.d_model": 64, "asr.encoder_layers": 1, "asr.decoder_layers": 1,
        "asr.num_heads": 4, "asr.n_mels": 16, "asr.vocab_size": 261,
        "asr.max_source_positions": 512, "asr.max_target_positions": 32,
        "asr.max_decode_tokens": 4,
    })

    class FixedText(SemanticEncoder):
        # _finalize is the host-decode hook shared by the sync and the
        # async-submit paths, so the fixed text applies to both
        def _finalize(self, arrays, b_real):
            out = super()._finalize(arrays, b_real)
            for i, r in enumerate(out):
                r["text"] = f"phrase {i}"
            return out

    return SessionManager(cfg, encoder=FixedText(cfg, buckets=(48_000 * 4,)))


def test_sessions_lifecycle(manager):
    s = manager.add_session("a")
    assert s.session_id == "a"
    with pytest.raises(KeyError):
        manager.add_session("a")
    manager.remove_session("a")
    assert "a" not in manager.sessions


def test_batched_ticks_produce_per_session_packets(manager):
    n_sessions = 6
    for i in range(n_sessions):
        manager.add_session(f"s{i}")

    # distinct per-session audio: one spoken turn then silence
    for i in range(n_sessions):
        audio = conversation(turns=1, speech_seconds=1.0, silence_seconds=1.0,
                             f0=150.0 + 30 * i, amp=0.3, seed=i)
        assert manager.push_audio(f"s{i}", audio)

    packets = []
    for _ in range(80):  # enough ticks to drain ~2s of chunks
        packets.extend(manager.tick())
        if len(packets) >= n_sessions:
            break

    got_sessions = {sid for sid, _ in packets}
    assert got_sessions == {f"s{i}" for i in range(n_sessions)}
    stats = manager.stats()
    assert all(st["phrases_encoded"] == 1 for st in stats.values())
    for i in range(n_sessions):
        manager.remove_session(f"s{i}")


def test_session_isolation(manager):
    """A silent session must produce nothing while a talking one does."""
    talker = manager.add_session("talker")
    silent = manager.add_session("silent")
    manager.push_audio("talker", conversation(turns=1, speech_seconds=1.0,
                                              silence_seconds=1.0, amp=0.3))
    manager.push_audio("silent", np.zeros(2 * 48_000, np.float32))

    packets = []
    for _ in range(80):
        packets.extend(manager.tick())
    sids = {sid for sid, _ in packets}
    assert "talker" in sids
    assert "silent" not in sids
    manager.remove_session("talker")
    manager.remove_session("silent")


def test_stage_timer_rtf():
    t = StageTimer()
    with t.stage("encode"):
        pass
    with t.stage("encode"):
        pass
    t.add_audio_seconds(10.0)
    rep = t.report()
    assert rep["encode"]["calls"] == 2
    assert rep["encode"]["rtf"] >= 0.0


def test_trace_noop():
    with trace(None):
        x = 1 + 1
    assert x == 2


def test_snapshot_restore_resumes_mid_phrase(manager):
    """A phrase split across snapshot/restore must still complete."""
    from janus_tpu.audio.synthetic import conversation

    s = manager.add_session("resume")
    audio = conversation(turns=1, speech_seconds=1.0, silence_seconds=1.0,
                         amp=0.3)
    half = len(audio) // 2
    manager.push_audio("resume", audio[:half])
    for _ in range(40):
        manager.tick()

    snap = manager.snapshot()
    assert "resume" in snap
    manager.remove_session("resume")

    # a fresh manager (same encoder) picks up the stream mid-phrase
    manager.restore({"resume": snap["resume"]})
    manager.push_audio("resume", audio[half:])
    packets = []
    for _ in range(60):
        packets.extend(manager.tick())
    assert any(sid == "resume" for sid, _ in packets)
    manager.remove_session("resume")


def _run_isolation_case(manager, monkeypatch, poison_at):
    """One poisoned session must not take down the others' packets.

    ``poison_at`` selects where the batched program dies: 'dispatch'
    (encode_batch_submit raises) or 'completion' (the async program fails
    at harvest time — PendingEncode.result raises)."""
    from janus_tpu.audio.synthetic import conversation
    from janus_tpu.runtime.codec import PendingEncode

    manager.add_session("good")
    manager.add_session("bad")
    for sid in ("good", "bad"):
        manager.push_audio(sid, conversation(turns=1, speech_seconds=1.0,
                                             silence_seconds=1.0, amp=0.3))

    real_submit = type(manager.encoder).encode_batch_submit
    single_calls = []

    class ExplodingPending(PendingEncode):
        def __init__(self):
            pass

        def is_ready(self):
            return True

        def result(self):
            raise RuntimeError("batched program crashed at completion")

    def submit_hook(phrases):
        if len(phrases) > 1:
            if poison_at == "dispatch":
                raise RuntimeError("batched program crashed at dispatch")
            return ExplodingPending()
        # per-phrase retries run in session order (good first, bad second):
        # poison the second one
        single_calls.append(len(phrases))
        if len(single_calls) == 2:
            raise RuntimeError("poisoned phrase")
        return real_submit(manager.encoder, phrases)

    monkeypatch.setattr(manager.encoder, "encode_batch_submit", submit_hook)

    packets = []
    for _ in range(80):
        packets.extend(manager.tick())
    packets.extend(manager.flush())
    sids = {sid for sid, _ in packets}
    assert "good" in sids  # survivor unaffected
    assert "bad" not in sids  # poisoned session degraded alone
    assert len(single_calls) >= 2  # fallback path actually exercised
    manager.remove_session("good")
    manager.remove_session("bad")


def test_failure_isolation_at_dispatch(manager, monkeypatch):
    _run_isolation_case(manager, monkeypatch, "dispatch")


def test_failure_isolation_at_completion(manager, monkeypatch):
    _run_isolation_case(manager, monkeypatch, "completion")


def test_capture_during_snapshot_loses_nothing(manager):
    """A capture thread pushing on a tight cadence across repeated
    snapshots must lose zero samples and keep ordering (push_audio diverts
    into the bounded spill while paused, drained back in order)."""
    import threading
    import time as _time

    manager.add_session("snapper")
    s = manager.sessions["snapper"]
    accepted = []
    stop = threading.Event()

    def pusher():
        i = 0
        while not stop.is_set():
            chunk = np.full(192, float(i % 997), dtype=np.float32)
            if manager.push_audio("snapper", chunk):
                accepted.append(chunk)
            i += 1
            _time.sleep(0.0005)

    t = threading.Thread(target=pusher)
    t.start()
    try:
        spilled_any = False
        for _ in range(50):
            manager.snapshot()
            spilled_any = spilled_any or s.spill_budget > 0
        # give the pusher a little more runway after the last snapshot
        _time.sleep(0.01)
    finally:
        stop.set()
        t.join(timeout=5)

    drained = s.ring.pop(len(s.ring))
    expected = np.concatenate(accepted)
    assert drained is not None
    np.testing.assert_array_equal(drained, expected)
    assert not s.paused and not s.spill
    manager.remove_session("snapper")


def test_overlap_defers_harvest_until_device_done(manager, monkeypatch):
    """tick() must NOT block on an unfinished encode: the packet appears
    on a later tick once the device reports done, the in-flight window
    stays visible, and flush() force-drains. (SURVEY §2.4 runtime overlap.)"""
    from janus_tpu.audio.synthetic import conversation
    from janus_tpu.runtime.codec import PendingEncode

    manager.add_session("ov")
    manager.push_audio("ov", conversation(turns=1, speech_seconds=1.0,
                                          silence_seconds=1.0, amp=0.3))

    real_submit = type(manager.encoder).encode_batch_submit

    class SlowPending:
        """Wraps the real pending but reports not-ready for N polls."""

        def __init__(self, inner, not_ready_polls=3):
            self.inner = inner
            self.polls_left = not_ready_polls

        def is_ready(self):
            if self.polls_left > 0:
                self.polls_left -= 1
                return False
            return True

        def result(self):
            return self.inner.result()

    submitted = []

    def submit_hook(phrases):
        p = SlowPending(real_submit(manager.encoder, phrases))
        submitted.append(p)
        return p

    monkeypatch.setattr(manager.encoder, "encode_batch_submit", submit_hook)

    packets = []
    dispatch_tick = None
    harvest_tick = None
    for k in range(200):
        got = manager.tick()
        packets.extend(got)
        if submitted and dispatch_tick is None:
            dispatch_tick = k
        if got and harvest_tick is None:
            harvest_tick = k
            break
    assert dispatch_tick is not None and harvest_tick is not None
    # the encode was dispatched on an earlier tick than it was harvested
    assert harvest_tick > dispatch_tick
    assert manager.inflight_encodes == 0
    assert packets and packets[0][0] == "ov"
    assert manager.flush() == []
    manager.remove_session("ov")
