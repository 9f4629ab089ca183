"""Regression tests for the driver entry points' backend robustness.

Round 2 lost both driver artifacts to a dead remote-TPU tunnel:
``dryrun_multichip`` probed ``jax.devices()`` before forcing the CPU
backend (MULTICHIP_r02 rc=124, indefinite hang inside PJRT init), and
``bench.py`` died with a traceback instead of a structured one-line JSON
(BENCH_r02 rc=1). These tests run both entry points in subprocesses with
the production environment (axon plugin registered, JAX_PLATFORMS=axon)
and pin that neither ever blocks on the default backend.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, env_extra, timeout):
    env = dict(os.environ)
    # undo the conftest's CPU forcing so the child sees the production env
    env.pop("XLA_FLAGS", None)
    env.setdefault("JAX_PLATFORMS", "axon")
    env.update(env_extra)
    return subprocess.run(
        [sys.executable] + args, cwd=REPO, env=env, timeout=timeout,
        capture_output=True, text=True)


def test_dryrun_multichip_never_touches_default_backend():
    # Must pass whether the TPU tunnel is up or down: the dryrun forces the
    # CPU backend before any jax API that would initialize a backend.
    r = _run(["-c", "import __graft_entry__; "
              "__graft_entry__.dryrun_multichip(4)"],
             env_extra={}, timeout=420)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])


def test_bench_fails_fast_with_structured_json():
    # With a sub-millisecond probe deadline, backend init can never win the
    # race (even a healthy local backend takes >50 ms to create), so this
    # deterministically exercises the fail-fast path regardless of tunnel
    # state: one-line JSON on stdout, exit code 0, well under 60 s.
    # POLL_BUDGET=0 collapses the round-4 retry loop (bench.py polls a down
    # backend for up to 10 min in production; here one failed probe must
    # emit the structured JSON immediately).
    r = _run(["bench.py"], env_extra={"ERL_GP_BENCH_INIT_TIMEOUT": "0.01",
                                      "ERL_GP_BENCH_POLL_BUDGET": "0"},
             timeout=120)
    assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
    lines = [ln for ln in r.stdout.strip().splitlines() if ln.strip()]
    assert lines, r.stderr[-2000:]
    payload = json.loads(lines[-1])
    assert payload["error"] == "tpu-backend-unavailable"
    assert payload["metric"] == "spgp_occupancy_map_updates_per_sec"
    assert set(payload) >= {"metric", "value", "unit", "vs_baseline"}


@pytest.mark.skipif(os.environ.get("ERL_GP_TEST_TPU") != "1",
                    reason="needs the real attached TPU chip")
def test_entry_compiles_on_chip():
    import __graft_entry__
    import jax
    fn, example_args = __graft_entry__.entry()
    out = jax.jit(fn).lower(*example_args).compile()
    assert out is not None


def test_entry_degrades_to_cpu_when_backend_unreachable():
    # entry() builds device arrays, so a dead tunnel would otherwise hang
    # the driver's compile check exactly like round 2's dryrun. The probe
    # (in a SUBPROCESS — an in-process thread probe that times out parks
    # inside jax's backend-init lock and deadlocks any fallback) must turn
    # that into a warned CPU-backend compile check, not a hang and not a
    # red artifact. A sub-millisecond probe deadline makes the race
    # deterministic in either tunnel state.
    r = _run(["-c",
              "import erl_gaussian_process_tpu.utils.backend as b;\n"
              "b.probe_backend_subprocess.__defaults__ = (0.01,)\n"
              "import __graft_entry__ as g, jax;\n"
              "fn, args = g.entry()\n"
              "assert jax.config.jax_platforms == 'cpu'\n"
              "jax.jit(fn).lower(*args).compile()\n"
              "print('cpu-fallback OK on', jax.default_backend())\n"],
             env_extra={}, timeout=300)
    assert r.returncode == 0, (r.stdout[-1500:], r.stderr[-1500:])
    assert "cpu-fallback OK on cpu" in r.stdout
