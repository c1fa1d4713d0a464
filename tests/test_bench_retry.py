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
    # these tests exercise the IN-PROCESS retry branch; a real probe child
    # would dial the ambient (possibly wedged) tunnel from inside the suite
    monkeypatch.setattr(bench, "_wait_for_backend", lambda: None)


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
    monkeypatch.setattr(bench, "_wait_for_backend", lambda: None)
    monkeypatch.setattr(
        os, "execv", lambda *a: pytest.fail("must not re-exec on non-UNAVAILABLE"))
    with pytest.raises(RuntimeError, match="boom"):
        bench._devices_with_retry()


# --- hang-probe path: jax.devices() can BLOCK indefinitely on a wedged
# tunnel, so bench probes in a bounded child process before importing jax.

def test_probe_skipped_when_backend_live(monkeypatch):
    import jax

    jax.devices()  # initialize the (cpu) backend in this process
    monkeypatch.setattr(
        bench, "_backend_probe_ok",
        lambda: pytest.fail("must not probe once a backend is live"))
    bench._wait_for_backend()  # returns immediately


def test_probe_taken_when_jax_imported_but_no_backend(monkeypatch):
    """The axon sitecustomize pre-imports jax at interpreter startup, so
    'jax in sys.modules' must NOT suppress the probe — only a live backend
    does (regression: the probe was dead code on the real harness)."""
    monkeypatch.setattr(bench, "_jax_backend_live", lambda: False)
    monkeypatch.delenv(bench._RETRY_ENV, raising=False)
    monkeypatch.setattr(bench, "_backend_probe_ok", lambda: True)
    bench._wait_for_backend()  # probe consulted (returning True -> proceed)


def test_hung_backend_waits_then_recovers(monkeypatch):
    monkeypatch.delitem(sys.modules, "jax", raising=False)
    monkeypatch.delenv(bench._RETRY_ENV, raising=False)
    monkeypatch.setattr(bench, "_RETRY_SLEEP_S", 0.0)
    outcomes = iter([False, False, True])
    monkeypatch.setattr(bench, "_backend_probe_ok", lambda: next(outcomes))
    bench._wait_for_backend()
    assert bench._RETRY_ENV in os.environ  # t0 recorded for later retries


def test_probe_child_never_killed_on_timeout(monkeypatch):
    """A hung probe child must be left alive (killing an axon client
    mid-flight wedges the tunnel) and re-awaited, not respawned."""
    monkeypatch.setattr(bench, "_probe_proc", None)
    monkeypatch.setattr(
        bench, "_PROBE_CODE", "import time; time.sleep(1.0)")
    monkeypatch.setattr(bench, "_PROBE_TIMEOUT_S", 0.2)
    assert bench._backend_probe_ok() is False
    child = bench._probe_proc
    assert child is not None and child.poll() is None  # alive, not killed
    pid = child.pid
    monkeypatch.setattr(bench, "_PROBE_TIMEOUT_S", 10.0)
    assert bench._backend_probe_ok() is True  # same child, awaited to exit 0
    assert child.pid == pid
    assert bench._probe_proc is None


def test_probe_respawns_after_refused_init(monkeypatch):
    monkeypatch.setattr(bench, "_probe_proc", None)
    monkeypatch.setattr(bench, "_PROBE_CODE", "import sys; sys.exit(3)")
    monkeypatch.setattr(bench, "_PROBE_TIMEOUT_S", 10.0)
    assert bench._backend_probe_ok() is False  # refused: child exits nonzero
    assert bench._probe_proc is None  # eligible for a fresh spawn
    monkeypatch.setattr(bench, "_PROBE_CODE", "pass")
    assert bench._backend_probe_ok() is True


def test_hung_backend_budget_exhaustion(monkeypatch):
    monkeypatch.delitem(sys.modules, "jax", raising=False)
    monkeypatch.setenv(
        bench._RETRY_ENV, str(time.time() - bench._RETRY_BUDGET_S - 1))
    monkeypatch.setattr(bench, "_RETRY_SLEEP_S", 0.0)
    monkeypatch.setattr(bench, "_backend_probe_ok", lambda: False)
    with pytest.raises(RuntimeError, match="unreachable"):
        bench._wait_for_backend()
