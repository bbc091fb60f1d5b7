"""Bounded-retry probe policy for the driver bench (VERDICT r3 #3):
a cold axon tunnel (backend init > one probe budget) must not cost the
bench its chip number, and a genuinely dead tunnel must still degrade
to the labeled CPU fallback. Probes are faked — fast lane."""

import os


def test_probe_retry_survives_cold_tunnel(monkeypatch):
    """VERDICT r3 #3: a tunnel that is merely COLD (init > one probe
    budget) must not cost the bench its chip number. Simulate a cold
    tunnel that answers on the third probe: the retry loop must land
    on True without pinning CPU. Fast (probes are faked), so not
    marked slow."""
    import __graft_entry__ as g

    for var in ("GRAFT_PROBE_TIMEOUT", "GRAFT_PROBE_RETRIES",
                "GRAFT_PROBE_RETRY_WAIT", "GRAFT_REQUIRE_LIVE"):
        monkeypatch.delenv(var, raising=False)
    monkeypatch.setattr(g, "_BACKEND_ALIVE", None)
    calls = []

    def cold_then_live(timeout):
        calls.append(timeout)
        return len(calls) >= 3

    monkeypatch.setattr(g, "_probe_once", cold_then_live)
    assert g.ensure_live_backend(timeout=240, retries=3,
                                 retry_wait=0) is True
    assert calls == [240, 240, 240]
    # memoized: no further probes
    assert g.ensure_live_backend() is True
    assert len(calls) == 3


def test_probe_retry_exhausted_pins_cpu(monkeypatch):
    """A genuinely dead tunnel still degrades to the labeled CPU
    fallback after the bounded retry window (no infinite probing)."""
    import __graft_entry__ as g

    for var in ("GRAFT_PROBE_TIMEOUT", "GRAFT_PROBE_RETRIES",
                "GRAFT_PROBE_RETRY_WAIT", "GRAFT_REQUIRE_LIVE"):
        monkeypatch.delenv(var, raising=False)
    # register the key with monkeypatch so the pin is rolled back
    monkeypatch.setenv("JAX_PLATFORMS", os.environ.get("JAX_PLATFORMS",
                                                       "cpu"))
    monkeypatch.setattr(g, "_BACKEND_ALIVE", None)
    calls = []
    monkeypatch.setattr(g, "_probe_once",
                        lambda timeout: calls.append(timeout) or False)
    assert g.ensure_live_backend(timeout=240, retries=3,
                                 retry_wait=0) is False
    assert len(calls) == 3
    assert os.environ["JAX_PLATFORMS"] == "cpu"


def test_probe_retry_env_overrides(monkeypatch):
    """GRAFT_PROBE_RETRIES / GRAFT_PROBE_RETRY_WAIT / GRAFT_PROBE_TIMEOUT
    override call-site defaults (the chip queue sets these)."""
    import __graft_entry__ as g

    monkeypatch.delenv("GRAFT_REQUIRE_LIVE", raising=False)
    monkeypatch.setenv("GRAFT_PROBE_TIMEOUT", "123")
    monkeypatch.setenv("GRAFT_PROBE_RETRIES", "2")
    monkeypatch.setenv("GRAFT_PROBE_RETRY_WAIT", "0")
    monkeypatch.setenv("JAX_PLATFORMS", os.environ.get("JAX_PLATFORMS",
                                                       "cpu"))
    monkeypatch.setattr(g, "_BACKEND_ALIVE", None)
    calls = []
    monkeypatch.setattr(g, "_probe_once",
                        lambda timeout: calls.append(timeout) or False)
    assert g.ensure_live_backend() is False
    assert calls == [123, 123]
