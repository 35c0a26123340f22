#!/bin/bash
# Standing per-round gate marathon — sequential, ONE Spark job at a time
# (concurrent local Spark sessions flake with "Python worker failed to
# connect back"). Logs land in $GATES_DIR; progress in
# $GATES_DIR/progress.txt; afterwards run
#   python tools/assemble_round_artifacts.py <round> [gates_dir]
# to build the per-round JSON artifacts from the logs, then run bench.py
# separately on a quiesced host (>= 5 min idle after this finishes).
#
# Usage: bash tools/run_round_gates.sh <round-number> [gates_dir]
set -u
N=${1:?round number, e.g. 13}
G=${2:-/tmp/gates_r$N}
mkdir -p "$G"
cd /root/repo
step() { echo "[$(date +%H:%M:%S)] START $1" >> "$G/progress.txt"; }
fin() { echo "[$(date +%H:%M:%S)] DONE  $1 (rc=$2)" >> "$G/progress.txt"; }

step oracle_sf0001
python tools/check_oracle.py /root/testdata/sf0.001 > "$G/oracle_sf0001.log" 2>&1; fin oracle_sf0001 $?
step oracle_sf001
python tools/check_oracle.py /root/testdata/sf0.01 > "$G/oracle_sf001.log" 2>&1; fin oracle_sf001 $?
step oracle_sf01
python tools/check_oracle.py /root/testdata/sf0.1 > "$G/oracle_sf01.log" 2>&1; fin oracle_sf01 $?
step plan_sf001
python tools/plan_sweep.py /root/testdata/sf0.01 PLAN_SWEEP_r$N.json \
  PLAN_SWEEP_r$((N-1)).json > "$G/plan_sf001.log" 2>&1; fin plan_sf001 $?
step plan_sf01
python tools/plan_sweep.py /root/testdata/sf0.1 PLAN_SWEEP_r${N}_sf01.json \
  PLAN_SWEEP_r$((N-1))_sf01.json > "$G/plan_sf01.log" 2>&1; fin plan_sf01 $?
step det_sf0001
python tools/determinism_check.py /root/testdata/sf0.001 > "$G/det_sf0001.log" 2>&1; fin det_sf0001 $?
step det_sf001
python tools/determinism_check.py /root/testdata/sf0.01 > "$G/det_sf001.log" 2>&1; fin det_sf001 $?
step det_sf01
python tools/determinism_check.py /root/testdata/sf0.1 > "$G/det_sf01.log" 2>&1; fin det_sf01 $?
step order_invariance
python tools/order_invariance_check.py /root/testdata/sf0.01 > "$G/order.log" 2>&1; fin order_invariance $?
step config_parity
python tools/config_parity_sweep.py /root/testdata/sf0.01 CONFIG_PARITY_r$N.json > "$G/config.log" 2>&1; fin config_parity $?
step checkpoint_sweep
python tools/checkpoint_sweep.py /root/testdata/sf0.001 CHECKPOINT_SWEEP_r$N.json > "$G/checkpoint.log" 2>&1; fin checkpoint_sweep $?
step degen_all
DEGEN_SWEEP_OUT="$G/degen_all.json" python tools/degenerate_sweep.py /root/testdata/sf0.001 all > "$G/degen_all.log" 2>&1; fin degen_all $?
step degen_skew
DEGEN_SWEEP_OUT="$G/degen_skew.json" python tools/degenerate_sweep.py /root/testdata/sf0.01 skew > "$G/degen_skew.log" 2>&1; fin degen_skew $?
step degen_skew90
DEGEN_SWEEP_OUT="$G/degen_skew90.json" python tools/degenerate_sweep.py /root/testdata/sf0.1 skew90 > "$G/degen_skew90.log" 2>&1; fin degen_skew90 $?
step sf1_smoke
python tools/sf1_smoke.py > "$G/sf1.log" 2>&1; fin sf1_smoke $?
step pytest
python -m pytest tests/ -q > "$G/pytest.log" 2>&1; fin pytest $?
echo MARATHON_DONE >> "$G/progress.txt"
