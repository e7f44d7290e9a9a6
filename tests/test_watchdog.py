"""Watchdog stall detection."""

import time

from janus_tpu.runtime.watchdog import Watchdog


def test_healthy_loop_never_alarms():
    wd = Watchdog()
    hb = wd.register("loop", interval=0.05, grace=3.0)
    for _ in range(6):
        hb.beat()
        time.sleep(0.02)
        assert wd.check() == []


def test_stalled_loop_alarms_once_then_recovers():
    alarms = []
    wd = Watchdog(on_stall=lambda name, age: alarms.append((name, age)))
    hb = wd.register("recv", interval=0.02, grace=2.0)
    time.sleep(0.1)
    assert wd.check() == ["recv"]
    assert wd.check() == []  # no repeat alarm while still stalled
    assert alarms and alarms[0][0] == "recv" and alarms[0][1] > 0.04
    hb.beat()
    assert wd.check() == []
    time.sleep(0.1)
    assert wd.check() == ["recv"]  # re-alarms after recovery + new stall


def test_background_monitor_thread():
    wd = Watchdog(poll=0.02)
    wd.register("x", interval=0.02, grace=1.5)
    wd.start()
    time.sleep(0.15)
    wd.stop()
    assert "x" in wd.stalls


def test_unregister():
    wd = Watchdog()
    wd.register("gone", interval=0.01)
    wd.unregister("gone")
    time.sleep(0.05)
    assert wd.check() == []
