#!/usr/bin/env bash
# Round-3 continuation driver: run the HD-tier capability demo (VERDICT #1,
# the highest-leverage artifact), then regenerate default-tier weights
# (fresh host), then the ipnet cross-backbone transfer (needs the
# default-tier agent/assess weights). HD runs FIRST because the tiers are
# fully independent (weights_demo_hd/train_demo_hd) and if the round runs
# out of wall-clock mid-pipeline the HD artifacts matter most.
#
# Every stage runs in its OWN python process: the axon tunnel client leaks
# host memory per device transfer (~16 MB/step for HD train_vos), so the
# process must be recycled at stage boundaries (CLAUDE.md). Stages are
# resumable — rerunning this script skips completed artifacts.
#
# Training state is COMMITTED as it lands (stage boundaries + a 5-min
# periodic loop): builder hosts reset between sessions, and uncommitted
# checkpoints die with the host. Orbax saves are atomic (tmp dirs + rename,
# tmp dirs gitignored), so a periodic add never sees a torn checkpoint.
#
# Stages run unbuffered with a quiet-log WATCHDOG: the axon tunnel
# intermittently wedges a device op forever (observed 2026-08-19: step 2
# of HD train_vos hung 10+ min with zero CPU; the chip answered again only
# after the client was killed). Every stage logs at least once a minute,
# so >8 min of log silence means a hang — kill and retry (3 attempts).
#
# Records the REAL shell pid (not a nohup wrapper's) in /tmp/r3_pipeline.pid
# so the run can be killed cleanly: kill $(cat /tmp/r3_pipeline.pid) stops
# the loop at the next stage boundary; kill the python pid in
# /tmp/r3_stage.pid to abort the current stage.

set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/r3_pipeline.pid
LOG=/tmp/r3_pipeline.log

PERIODIC_MSG="pipeline: periodic training-state snapshot"

persist() {
    # Commit new/updated training state; lock contention with a concurrent
    # builder commit just means we retry at the next boundary/tick.
    # Mid-train orbax snapshots are ~94 MB and change every 500 steps, so
    # consecutive periodic snapshots AMEND each other instead of stacking
    # fresh blobs into history, and a stage-boundary commit first squashes
    # any trailing periodic snapshots it supersedes.
    git add -A weights_demo weights_demo_hd train_demo train_demo_hd results 2>/dev/null
    if git diff --cached --quiet 2>/dev/null; then
        return 0
    fi
    if [ "$1" = periodic ]; then
        if [ "$(git log -1 --pretty=%s)" = "$PERIODIC_MSG" ]; then
            git commit -q --amend -m "$PERIODIC_MSG" || git reset -q 2>/dev/null
        else
            git commit -q -m "$PERIODIC_MSG" || git reset -q 2>/dev/null
        fi
    else
        while [ "$(git log -1 --pretty=%s)" = "$PERIODIC_MSG" ]; do
            git reset -q --soft HEAD~1 || break
        done
        git add -A weights_demo weights_demo_hd train_demo train_demo_hd results 2>/dev/null
        git commit -q -m "pipeline: persist training state ($1)" || git reset -q 2>/dev/null
    fi
}

( while true; do sleep 300; persist periodic; done ) &
PERSIST_PID=$!
trap 'kill $PERSIST_PID 2>/dev/null' EXIT

QUIET_LIMIT=480   # seconds of log silence that count as a hang

run_stage() {
    # run_stage <phase-label> <script> <args...>
    local label=$1; shift
    local attempt rc pid wd
    for attempt in 1 2 3; do
        echo "[$(date +%H:%M:%S)] >>> $label (attempt $attempt): python -u scripts/$*" | tee -a "$LOG"
        python -u "scripts/$1" "${@:2}" >> "$LOG" 2>&1 &
        pid=$!
        echo $pid > /tmp/r3_stage.pid
        ( while kill -0 "$pid" 2>/dev/null; do
              sleep 60
              local quiet=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
              if [ "$quiet" -gt "$QUIET_LIMIT" ]; then
                  echo "[$(date +%H:%M:%S)] WATCHDOG: $label quiet ${quiet}s, killing $pid" >> "$LOG"
                  kill "$pid" 2>/dev/null; sleep 10; kill -9 "$pid" 2>/dev/null
                  break
              fi
          done ) &
        wd=$!
        wait "$pid"; rc=$?
        kill "$wd" 2>/dev/null
        local rss
        rss=$(free -m | awk '/Mem:/{print $3}')
        echo "[$(date +%H:%M:%S)] <<< $label rc=$rc host-used=${rss}M" | tee -a "$LOG"
        if [ "$rc" -eq 0 ]; then
            persist "$label"
            return 0
        fi
        persist "$label-partial"   # keep whatever snapshots the attempt left
        sleep 20                   # give the tunnel a moment to recover
    done
    echo "STAGE FAILED after 3 attempts: $label" | tee -a "$LOG"
    touch /tmp/r3_pipeline.FAILED
    exit 1
}

STAGES="tapnet qadata assess_pretext assess reward pretrain agent agent_wild evaluate"

# --- Phase B: HD tier (VERDICT round-2 item #1) with probe gates ---
run_stage "B/hd/tapnet" demo_ordering.py tapnet --tier hd
run_stage "B/hd/probe-bands" demo_probe.py bands --tier hd
for s in qadata assess_pretext assess; do
    run_stage "B/hd/$s" demo_ordering.py "$s" --tier hd
done
run_stage "B/hd/probe-qa" demo_probe.py qa --tier hd
for s in reward pretrain agent agent_wild evaluate; do
    run_stage "B/hd/$s" demo_ordering.py "$s" --tier hd
done

# --- Phase A: default-tier rebuild (weights gone on this fresh host; the
# committed seed-0 artifacts make `evaluate` a no-op skip, so this phase
# only retrains weights the ipnet transfer needs; bit-reproducible) ---
for s in $STAGES; do
    run_stage "A/default/$s" demo_ordering.py "$s"
done

# --- Phase D: ytbvos-format results demo (cheap, eval-only; needs Phase A
# weights; runs before the ~2h ipnet phase so it lands even if time runs
# out) — covers the reference table's second dataset axis at results level ---
run_stage "D/ytbvos" demo_ytbvos.py

# --- Phase C: ipnet cross-backbone transfer (round-4 queue item 1b) ---
run_stage "C/ipnet/train" demo_ordering.py tapnet --vos ipnet
run_stage "C/ipnet/evaluate" demo_ordering.py evaluate --vos ipnet

echo "[$(date +%H:%M:%S)] ALL PHASES DONE" | tee -a "$LOG"
touch /tmp/r3_pipeline.DONE
