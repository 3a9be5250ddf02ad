"""Test harness: force an 8-device virtual CPU mesh before JAX backends init.

This is the JAX-native answer to multi-device testing without a cluster
(SURVEY.md §4 "Implication for the rebuild"): every test sees 8 CPU devices
and sharding/pjit paths run for real.

NOTE: jax may already be *imported* by a pytest plugin before this conftest
runs, so env vars alone are not reliable — we use jax.config.update, which
works any time before backend initialization.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# persistent compile cache makes repeat test runs fast
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


@pytest.fixture(scope="session")
def devices():
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 virtual devices, got {len(devs)}"
    return devs


# ---------------------------------------------------------------------------
# fast-suite duration budget (VERDICT r3 next #6): the `-m "not slow"` suite
# must stay under 5 minutes, structurally — any NON-slow test that exceeds
# the per-test budget fails with instructions to move it to `slow`. The
# default budget is generous (20 s; healthy fast tests run well under 10 s
# uncontended) so host contention doesn't flake the suite; tune with
# MVPTR_TEST_BUDGET_S, or set 0 to disable (e.g. on a known-contended box).
#
# Host-speed scaling (VERDICT r4 next #6): the budgets were calibrated on
# the reference 1-core build host when healthy — on a contended or slower
# host the SAME test legitimately takes longer, and both r4 suite failures
# were exactly such guard artifacts (the code passed solo). A fixed CPU
# workload measured once per session scales every budget by how much
# slower this host runs right now (clamped to 4x: a genuinely hung test
# must still fail).
# ---------------------------------------------------------------------------

import time  # noqa: E402

_BUDGET_S = float(os.environ.get("MVPTR_TEST_BUDGET_S", "20"))
# reference: best-of sha256 over 64 MB ≈ 50 ms on the healthy build host
_PROBE_REF_MS = 50.0
_host_factor = None


def _probe_factor() -> float:
    import hashlib
    buf = b"x" * (1 << 20)
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        h = hashlib.sha256()
        for _ in range(64):
            h.update(buf)
        walls.append((time.perf_counter() - t0) * 1e3)
    return min(4.0, max(1.0, sorted(walls)[1] / _PROBE_REF_MS))


def _host_speed_factor() -> float:
    """How much slower this host is than the budget-calibration host,
    measured by a fixed GIL-bound workload (median of 3; contention
    deschedules the probe exactly like it deschedules a test)."""
    global _host_factor
    if _host_factor is None:
        _host_factor = _probe_factor()
    return _host_factor


def pytest_report_header(config):
    return (f"mvptr test budget: {_BUDGET_S:.0f}s base x "
            f"{_host_speed_factor():.2f} host-speed factor")


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_call(item):
    t0 = time.time()
    outcome = yield
    took = time.time() - t0
    if outcome.excinfo is not None:
        # the test already failed/errored on its own: surface THAT —
        # pytest.fail here would replace the real traceback with the
        # budget message whenever a failing test is also slow
        return
    budget = _BUDGET_S
    marker = item.get_closest_marker("budget")
    if marker is not None and marker.args:
        # a handful of legitimately compile-heavy fast tests (multi-model
        # end-to-end pipelines) declare a higher allowance instead of
        # leaving the fast suite flaky under host contention
        budget = max(budget, float(marker.args[0]))
    factor = _host_speed_factor()
    if (_BUDGET_S > 0 and took > budget * factor
            and "slow" not in item.keywords):
        # the cached factor was measured at session start; contention that
        # arrived mid-run (another process grabbing the 1-core host) slows
        # tests without updating it — re-probe NOW and take the worse
        # reading before declaring a real failure
        factor = max(factor, _probe_factor())
    budget *= factor
    if (_BUDGET_S > 0 and took > budget
            and "slow" not in item.keywords):
        pytest.fail(
            f"non-slow test took {took:.1f}s (> {budget:.0f}s budget incl. "
            f"{factor:.2f}x host-speed factor): mark it "
            f"@pytest.mark.slow or speed it up — the fast suite must stay "
            f"under 5 minutes (MVPTR_TEST_BUDGET_S overrides)",
            pytrace=False)
