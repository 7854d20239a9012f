#!/usr/bin/env bash
# Round-4 pipeline driver: finish the HD tier (resume from the committed
# partial checkpoint), rebuild default-tier weights, then the eval-only
# follow-ons (ytbvos demo, ipnet transfer, extra wild seeds, repeat-knob
# artifact). Fixes the three round-3 pipeline defects called out in
# VERDICT.md / ADVICE.md:
#
#  1. A failed stage no longer forfeits independent phases: each phase is a
#     function; a stage failure aborts only its own phase (B failing does
#     not stop A/D/C).
#  2. The watchdog distinguishes a tunnel WEDGE (zero CPU, all threads in
#     futex/ep_poll — kill and retry) from a silent XLA compile (CPU busy
#     for minutes on the single core — wait). It keys on the stage
#     process's utime+stime from /proc, not log mtime alone.
#  3. persist() adds each pathspec individually (git add -A with one
#     missing pathspec is rc-128 fatal and stages NOTHING — ADVICE high),
#     serializes via flock, commits with explicit pathspecs so concurrent
#     builder-staged files are never swept in (ADVICE medium), and the
#     periodic tick commits only the small CSV dirs — big orbax blobs land
#     at stage boundaries only, so there is no amend/squash TOCTOU and no
#     unreachable-blob bloat (ADVICE low).
#
# Every stage runs in its OWN python process (axon tunnel client leaks host
# memory per device transfer — CLAUDE.md). Stages are resumable; rerunning
# the script skips completed artifacts. TPU jobs run strictly sequentially.

set -u
cd "$(dirname "$0")/.."
echo $$ > /tmp/r4_pipeline.pid
LOG=/tmp/r4_pipeline.log
LOCK=/tmp/r4_persist.lock

BIG_DIRS="weights_demo weights_demo_hd train_demo train_demo_hd results"
# Periodic tick now includes the weights dirs: agent epoch snapshots (a few
# MB each) are the resume points for the long agent stages and must survive
# host death; the big backbone/assess orbax trees in the same dirs only
# produce new blobs when their content actually changes (git no-ops on
# unchanged files), so this adds no bloat during eval/agent stages.
SMALL_DIRS="weights_demo weights_demo_hd train_demo train_demo_hd results"

persist() {
    # persist <label> [dirs...] — commit training state under flock.
    local label=$1; shift
    local dirs=${*:-$BIG_DIRS}
    (
        flock 9 || exit 1
        # Build the pathspec list from dirs that exist IN GIT OR ON DISK:
        # `git commit -- <pathspec>` is rc-1 FATAL when any single pathspec
        # matches no file known to git (observed in the r4 log: weights_demo
        # / train_demo absent until phase A starts), so a missing dir must
        # be dropped from the commit pathspecs too, not just from git add.
        local d staged=0 have=""
        for d in $dirs; do
            [ -e "$d" ] || continue
            if ! git add -A -- "$d" 2>>"$LOG"; then
                echo "persist: git add $d FAILED" >> "$LOG"; continue
            fi
            # a dir whose content is all gitignored (e.g. the HD
            # quality_assessment dump tree) has no index entries even after
            # add — keep it out of the commit pathspecs too
            if git ls-files -- "$d" | grep -q .; then staged=1; have="$have $d"; fi
        done
        [ "$staged" = 1 ] || exit 0
        if git diff --cached --quiet -- $have 2>/dev/null; then exit 0; fi
        git commit -q -m "pipeline: persist training state ($label)" -- $have \
            2>>"$LOG" || echo "persist: git commit ($label) FAILED" >> "$LOG"
    ) 9>"$LOCK"
}

( while true; do sleep 300; persist periodic $SMALL_DIRS; done ) &
PERSIST_PID=$!
trap 'kill $PERSIST_PID 2>/dev/null' EXIT

QUIET_LIMIT=480   # seconds of log silence before the CPU-ticks check kicks in
TICK_FLOOR=50     # <0.5 s of CPU over a 60 s window while quiet == wedged

cpu_ticks() { awk '{print $14+$15}' "/proc/$1/stat" 2>/dev/null || echo -1; }

run_stage() {
    # run_stage <phase-label> <script> <args...>; returns non-zero on failure
    # instead of exiting (phase isolation).
    local label=$1; shift
    local attempt rc pid wd
    for attempt in 1 2 3 4; do
        echo "[$(date +%H:%M:%S)] >>> $label (attempt $attempt): python -u scripts/$*" | tee -a "$LOG"
        python -u "scripts/$1" "${@:2}" >> "$LOG" 2>&1 &
        pid=$!
        echo $pid > /tmp/r4_stage.pid
        (
          # Watchdog: kill only when the log has been quiet AND the process
          # burned ~no CPU over the last minute (a cold XLA compile is quiet
          # for many minutes but pegs the core; a tunnel wedge is quiet at
          # zero CPU — the documented /proc diagnostic, CLAUDE.md).
          local prev_ticks=-1 now_ticks quiet
          while kill -0 "$pid" 2>/dev/null; do
              sleep 60
              quiet=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
              now_ticks=$(cpu_ticks "$pid")
              if [ "$quiet" -gt "$QUIET_LIMIT" ] && [ "$now_ticks" -ge 0 ] \
                 && [ "$prev_ticks" -ge 0 ] \
                 && [ $(( now_ticks - prev_ticks )) -lt "$TICK_FLOOR" ]; then
                  echo "[$(date +%H:%M:%S)] WATCHDOG: $label quiet ${quiet}s, cpu-delta $(( now_ticks - prev_ticks )) ticks/60s, killing $pid" >> "$LOG"
                  kill "$pid" 2>/dev/null; sleep 10; kill -9 "$pid" 2>/dev/null
                  break
              fi
              prev_ticks=$now_ticks
          done
        ) &
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
    echo "STAGE FAILED after 4 attempts: $label" | tee -a "$LOG"
    echo "$label" >> /tmp/r4_failed_stages
    return 1
}

STAGES="tapnet qadata assess_pretext assess reward pretrain agent agent_wild evaluate"

phase_b_hd() {
    run_stage "B/hd/tapnet" demo_ordering.py tapnet --tier hd || return 1
    # The probes are gates for the NEXT stage; when that stage's artifact is
    # already committed the gate has passed on a previous host — re-running
    # it would burn ~30 min of HD TPU time for nothing (hosts are ephemeral,
    # probe output lives only in the log).
    if [ -e weights_demo_hd/assess_net.orbax ]; then
        echo "skip B/hd/probe-bands (assess_net.orbax exists — gate passed)" | tee -a "$LOG"
    else
        run_stage "B/hd/probe-bands" demo_probe.py bands --tier hd || return 1
    fi
    local s
    for s in qadata assess_pretext assess; do
        run_stage "B/hd/$s" demo_ordering.py "$s" --tier hd || return 1
    done
    if [ -e train_demo_hd/reward.csv ]; then
        echo "skip B/hd/probe-qa (reward.csv exists — gate passed)" | tee -a "$LOG"
    else
        run_stage "B/hd/probe-qa" demo_probe.py qa --tier hd || return 1
    fi
    for s in reward pretrain agent agent_wild evaluate; do
        run_stage "B/hd/$s" demo_ordering.py "$s" --tier hd || return 1
    done
}

phase_a_default() {
    local s
    for s in $STAGES; do
        run_stage "A/default/$s" demo_ordering.py "$s" || return 1
    done
}

phase_d_ytbvos() { run_stage "D/ytbvos" demo_ytbvos.py; }

phase_c_ipnet() {
    run_stage "C/ipnet/train" demo_ordering.py tapnet --vos ipnet || return 1
    run_stage "C/ipnet/evaluate" demo_ordering.py evaluate --vos ipnet || return 1
}

phase_e_extras() {
    # Eval-only evidence upgrades (VERDICT weak #4, missing #7): more wild
    # registry seeds so blind-vs-quality exits the noise band, and one
    # artifact exercising allow_repeat + max_time (reference eval semantics).
    run_stage "E/seeds" demo_multiseed.py --seeds 3 4 5 || true
    run_stage "E/repeat" demo_repeat.py || true
}

# --- Phase order: HD first (highest-value artifact, fully independent
# dirs), then the default rebuild that D/C/E depend on. A phase failure
# forfeits only that phase. ---
phase_b_hd        || echo "PHASE B (hd) FORFEITED" | tee -a "$LOG"
if phase_a_default; then
    phase_d_ytbvos || echo "PHASE D (ytbvos) FORFEITED" | tee -a "$LOG"
    phase_c_ipnet  || echo "PHASE C (ipnet) FORFEITED" | tee -a "$LOG"
    phase_e_extras
else
    echo "PHASE A (default) FORFEITED — D/C/E skipped (need its weights)" | tee -a "$LOG"
fi

echo "[$(date +%H:%M:%S)] ALL PHASES DONE" | tee -a "$LOG"
touch /tmp/r4_pipeline.DONE
