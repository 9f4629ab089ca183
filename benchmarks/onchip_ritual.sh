#!/bin/bash
# The per-round on-chip validation ritual (VERDICT r1 item 9): run the
# TPU-only kernel parity tests, the perf captures, the headline bench, and
# the full on-chip suite — in dependency order. Results are tee'd to
# benchmarks/onchip_<date>.log; summarize the numbers in BENCHMARKS.md +
# CHANGELOG.md each round.
#
# Requires the axon TPU tunnel to be up (jax.devices() shows the chip).
# Only ONE process may use the TPU at a time — do not run anything else
# against the chip while this is running.
#
# RESILIENCE (round 4): the tunnel drops transiently mid-compile
# ("response body closed before all bytes were read", observed
# 2026-08-18 21:58 killing a whole run 15 min in under set -e). Every
# phase now runs through run_phase: up to $RITUAL_RETRIES attempts with a
# $RITUAL_BACKOFF_S sleep between them (the remote chip lock lingers
# 2-4 min after a dead client). The PARITY phase gates everything — if it
# cannot pass, the ritual aborts so a broken kernel never produces a
# "clean" bench. Perf phases record their failure and the ritual moves
# on: rounds 2-3 both ended with ZERO hardware numbers, so banking the
# phases that DO succeed beats all-or-nothing.
set -uo pipefail
cd "$(dirname "$0")/.."
log="benchmarks/onchip_$(date -u +%Y%m%d_%H%M).log"
RITUAL_RETRIES="${RITUAL_RETRIES:-3}"
RITUAL_BACKOFF_S="${RITUAL_BACKOFF_S:-180}"
failed_phases=()

run_phase() {
  # run_phase <gate|perf> <name> <cmd...>
  local kind="$1" name="$2"; shift 2
  local attempt rc
  for attempt in $(seq 1 "$RITUAL_RETRIES"); do
    echo "== $name (attempt $attempt/$RITUAL_RETRIES) =="
    "$@"
    rc=$?
    if [ "$rc" -eq 0 ]; then return 0; fi
    echo "== $name FAILED rc=$rc =="
    if [ "$attempt" -lt "$RITUAL_RETRIES" ]; then
      echo "== waiting ${RITUAL_BACKOFF_S}s for the chip lock to clear =="
      sleep "$RITUAL_BACKOFF_S"
    fi
  done
  failed_phases+=("$name")
  if [ "$kind" = gate ]; then
    echo "== GATE PHASE $name failed after $RITUAL_RETRIES attempts — aborting =="
    exit 1
  fi
  return 0
}

{
  # fail the ritual fast (not hang) when the tunnel is down: backend init
  # blocks indefinitely inside PJRT client creation in that state
  run_phase gate "devices" timeout 90 python -c "import jax; print(jax.devices())"

  # -x: a wedged TPU backend fails EVERY test in the process (observed
  # 2026-08-18: 22 aborts x ~70 s of retries = 25 wasted minutes); stop
  # at the first failure instead.
  # stdbuf -oL + -v: each test flushes a line into the log as it finishes.
  # Remote-side compiles (30-90 s each, ZERO local CPU) otherwise make a
  # healthy run indistinguishable from a wedged tunnel for tens of
  # minutes — two healthy runs were killed on that misread 2026-08-18.
  # Patience rule: after killing ANY TPU process, the remote chip lock
  # lingers for minutes; the next client's first dispatch blocks until
  # it clears. Don't kill a phase unless the LOG is silent >30 min.
  run_phase gate "TPU-only kernel parity (test_ops)" \
    env ERL_GP_TEST_TPU=1 stdbuf -oL -eL python -m pytest tests/test_ops.py -v -x

  # Phase order: parity gate first, then EVERY perf capture (rounds 2-3
  # both died owing hardware numbers — bank those before anything long),
  # and the full on-chip suite last: with cold remote compiles it is the
  # multi-hour phase, and a failure there must not cost the numbers.
  run_phase perf "streaming-chol profile" python benchmarks/profile_chol.py
  run_phase perf "streaming-chol A/B (HEAD vs last measured rev vs XLA)" \
    python benchmarks/ab_chol.py
  run_phase perf "elimination-rank A/B (defaults: chol r2, bank r1)" \
    python benchmarks/ab_elim.py
  run_phase perf "elimination-rank A/B (swapped: chol r1, bank r2)" \
    env ERL_GP_CHOL_ELIM1=1 ERL_GP_BANK_ELIM2=1 python benchmarks/ab_elim.py
  run_phase perf "full suite benchmarks (BENCHMARKS.md rows incl. roofline)" \
    python benchmarks/suite.py
  run_phase perf "headline bench" python bench.py
  run_phase perf "full suite on-chip (incl. full-size reference goldens)" \
    env ERL_GP_HEAVY=1 ERL_GP_TEST_TPU=1 stdbuf -oL -eL python -m pytest tests/ -v -x

  if [ "${#failed_phases[@]}" -gt 0 ]; then
    echo "== ritual finished with FAILED phases: ${failed_phases[*]} =="
  else
    echo "== ritual finished: all phases green =="
  fi
} 2>&1 | tee "$log"
echo "ritual complete -> $log"
