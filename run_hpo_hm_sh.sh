#!/bin/bash
# Successive-halving H&M study driver: one process per (trial, rung) leg
# with one retry each (axon-relay wedge isolation; each leg resumes from
# its trial's 100-step checkpoints, so a retry loses <=100 steps).
set -u
cd "$(dirname "$0")"
ROWS=${ROWS:-/tmp/hpo_hm_rows.jsonl}
LOG=${LOG:-/tmp/hpo_hm_v2.log}

leg () {  # leg TRIAL BUDGET TIMEOUT
  local t=$1 b=$2 to=$3
  for attempt in 1 2; do
    echo "=== trial $t budget $b (attempt $attempt) ===" >> "$LOG"
    timeout "$to" python hpo_hm_v2.py --trial "$t" --budget "$b" \
      --rows-file "$ROWS" >> "$LOG" 2>&1 && return 0
    echo "=== trial $t budget $b attempt $attempt FAILED (rc=$?) ===" >> "$LOG"
  done
  return 1
}

# rung 1: all candidates at 300 steps
for t in 0 1 2 3; do leg "$t" 300 2400; done

# rung 2: survivors at 1000 steps (resuming rung-1 state)
SURV=$(python hpo_hm_v2.py --select-at 300 --rows-file "$ROWS")
echo "=== rung-1 survivors: $SURV ===" >> "$LOG"
for t in $SURV; do leg "$t" 1000 4500; done

python hpo_hm_v2.py --aggregate --rows-file "$ROWS" >> "$LOG" 2>&1
echo done > /tmp/hpo_sh.done
