#!/bin/bash
# The per-round on-chip validation ritual (VERDICT r1 item 9): run the
# TPU-only kernel parity tests, the full suite against the real chip, the
# kernel profile, and the headline bench — in dependency order, stopping
# at the first failure so a broken kernel never produces a "clean" bench.
# Results are tee'd to benchmarks/onchip_<date>.log; summarize the numbers
# in BENCHMARKS.md + CHANGELOG.md each round.
#
# Requires the axon TPU tunnel to be up (jax.devices() shows the chip).
# Only ONE process may use the TPU at a time — do not run anything else
# against the chip while this is running.
set -euo pipefail
cd "$(dirname "$0")/.."
log="benchmarks/onchip_$(date -u +%Y%m%d_%H%M).log"
{
  echo "== devices =="
  # fail the ritual fast (not hang) when the tunnel is down: backend init
  # blocks indefinitely inside PJRT client creation in that state
  timeout 90 python -c "import jax; print(jax.devices())"
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
  # Phase order: kernel parity gates first (a broken kernel must not
  # produce a clean bench), then EVERY perf capture (rounds 2-3 both
  # died owing hardware numbers — bank those before anything long), and
  # the full on-chip suite last: with cold remote compiles (30-90 s
  # each, the persistent cache rarely applies through the tunnel) it is
  # the multi-hour phase, and a failure there must not cost the numbers.
  echo "== TPU-only kernel parity (test_ops) =="
  ERL_GP_TEST_TPU=1 stdbuf -oL -eL python -m pytest tests/test_ops.py -v -x
  echo "== streaming-chol profile =="
  python benchmarks/profile_chol.py
  echo "== streaming-chol A/B (HEAD vs last measured rev vs XLA) =="
  python benchmarks/ab_chol.py
  echo "== elimination-rank A/B (rank-2 default vs rank-1) =="
  python benchmarks/ab_elim.py
  ERL_GP_CHOL_ELIM1=1 ERL_GP_BANK_ELIM1=1 python benchmarks/ab_elim.py
  echo "== full suite benchmarks (BENCHMARKS.md rows incl. roofline) =="
  python benchmarks/suite.py
  echo "== headline bench =="
  python bench.py
  echo "== full suite on-chip (incl. full-size reference goldens) =="
  ERL_GP_HEAVY=1 ERL_GP_TEST_TPU=1 stdbuf -oL -eL python -m pytest tests/ -v -x
} 2>&1 | tee "$log"
echo "ritual complete -> $log"
