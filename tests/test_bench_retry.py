"""bench.py's UNAVAILABLE-retry: the driver runs bench.py once per round,
so a transient tunnel outage must re-exec (fresh process — jax caches a
failed backend init) rather than record a red bench."""

import os
import sys
import time
import types

import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

import bench  # noqa: E402


class _FakeJax(types.ModuleType):
    def __init__(self, err):
        super().__init__("jax")
        self._err = err

    def devices(self):
        raise RuntimeError(self._err)


@pytest.fixture
def fake_unavailable(monkeypatch):
    monkeypatch.setitem(
        sys.modules, "jax",
        _FakeJax("Unable to initialize backend 'axon': UNAVAILABLE: ..."))
    monkeypatch.delenv(bench._RETRY_ENV, raising=False)
    monkeypatch.setattr(bench, "_RETRY_SLEEP_S", 0.0)


def test_unavailable_triggers_reexec(fake_unavailable, monkeypatch):
    calls = []
    monkeypatch.setattr(os, "execv", lambda *a: calls.append(a))
    bench._devices_with_retry()
    assert len(calls) == 1
    exe, argv = calls[0]
    assert exe == sys.executable
    assert argv[1].endswith("bench.py")
    assert bench._RETRY_ENV in os.environ  # t0 travels to the re-exec


def test_budget_exhaustion_reraises(fake_unavailable, monkeypatch):
    monkeypatch.setenv(
        bench._RETRY_ENV, str(time.time() - bench._RETRY_BUDGET_S - 1))
    monkeypatch.setattr(
        os, "execv",
        lambda *a: pytest.fail("must not re-exec past the budget"))
    with pytest.raises(RuntimeError, match="UNAVAILABLE"):
        bench._devices_with_retry()


def test_other_errors_pass_through(monkeypatch):
    monkeypatch.setitem(sys.modules, "jax", _FakeJax("boom: out of memory"))
    monkeypatch.setattr(
        os, "execv", lambda *a: pytest.fail("must not re-exec on non-UNAVAILABLE"))
    with pytest.raises(RuntimeError, match="boom"):
        bench._devices_with_retry()
