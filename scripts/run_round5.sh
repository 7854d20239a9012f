#!/usr/bin/env bash
# Round-5 pipeline driver: resume/finish the phase queue (A default rebuild →
# D ytbvos → C ipnet → E extras), then the round-5 evidence additions (HD QA
# probe artifact). Inherits run_round4.sh's phase isolation, CPU-ticks
# watchdog and flock'd persist, and adds the VERDICT r4 ask #5 fix:
#
#   CHIP-SETTLE PROBE between watchdog kill and relaunch. A client launched
#   immediately after a mid-device-op kill can inherit the tunnel wedge
#   (CLAUDE.md, observed in the r4 log: ~30 min of blind 9-min retries on
#   A/default/assess_pretext). settle_probe runs a deadline-bounded trivial
#   device op in a THROWAWAY process and only relaunches the stage once the
#   chip answers, with escalating backoff — converting blind retry cycles
#   into seconds of probing. The probe is skipped between non-watchdog
#   failures (rc!=0 with a live tunnel does not imply a wedge).
#
# Refuses to start while the round-4 pipeline is alive (TPU jobs must be
# strictly sequential). Stages are resumable; rerunning skips completed
# artifacts.

set -u
cd "$(dirname "$0")/.."

if [ -f /tmp/r4_pipeline.pid ] && kill -0 "$(cat /tmp/r4_pipeline.pid)" 2>/dev/null; then
    echo "round-4 pipeline $(cat /tmp/r4_pipeline.pid) is alive — not starting" >&2
    exit 1
fi

echo $$ > /tmp/r5_pipeline.pid
LOG=/tmp/r5_pipeline.log
LOCK=/tmp/r4_persist.lock   # share the lock: persist is repo-global

BIG_DIRS="weights_demo weights_demo_hd train_demo train_demo_hd results"
SMALL_DIRS="$BIG_DIRS"

persist() {
    local label=$1; shift
    local dirs=${*:-$BIG_DIRS}
    (
        flock 9 || exit 1
        local d staged=0 have=""
        for d in $dirs; do
            [ -e "$d" ] || continue
            if ! git add -A -- "$d" 2>>"$LOG"; then
                echo "persist: git add $d FAILED" >> "$LOG"; continue
            fi
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

QUIET_LIMIT=480
TICK_FLOOR=50

cpu_ticks() { awk '{print $14+$15}' "/proc/$1/stat" 2>/dev/null || echo -1; }

settle_probe() {
    # Deadline-bounded trivial device op in a throwaway process, retried with
    # escalating backoff until the chip answers. Returns 0 once it does.
    # Each attempt must finish fast (the matmul is cached after the first
    # healthy run); a 120 s timeout tolerates one cold compile.
    local try
    for try in 1 2 3 4 5 6; do
        if timeout 120 python -u -c '
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_ivosw_bench")
x = jnp.ones((256, 256), jnp.float32)
print("settle:", float((x @ x)[0, 0]))' >> "$LOG" 2>&1; then
            echo "[$(date +%H:%M:%S)] settle probe: chip answering (try $try)" >> "$LOG"
            return 0
        fi
        echo "[$(date +%H:%M:%S)] settle probe try $try: chip NOT answering, backoff $((30 * try))s" >> "$LOG"
        sleep $((30 * try))
    done
    echo "[$(date +%H:%M:%S)] settle probe exhausted — relaunching anyway" >> "$LOG"
    return 1
}

run_stage() {
    local label=$1; shift
    local attempt rc pid wd watchdog_fired
    for attempt in 1 2 3 4; do
        # Pre-launch settle probe EVERY attempt: the r4 log shows ~50% of
        # stages wedge on their FIRST device op even after a clean previous
        # stage exit. A wedged throwaway probe absorbs the wedge (killing it
        # heals the chip — CLAUDE.md), so the stage starts against a
        # known-answering chip; costs ~2 s when healthy.
        settle_probe
        echo "[$(date +%H:%M:%S)] >>> $label (attempt $attempt): python -u scripts/$*" | tee -a "$LOG"
        python -u "scripts/$1" "${@:2}" >> "$LOG" 2>&1 &
        pid=$!
        echo $pid > /tmp/r5_stage.pid
        rm -f /tmp/r5_watchdog_fired
        (
          local prev_ticks=-1 now_ticks quiet
          while kill -0 "$pid" 2>/dev/null; do
              sleep 60
              quiet=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
              now_ticks=$(cpu_ticks "$pid")
              if [ "$quiet" -gt "$QUIET_LIMIT" ] && [ "$now_ticks" -ge 0 ] \
                 && [ "$prev_ticks" -ge 0 ] \
                 && [ $(( now_ticks - prev_ticks )) -lt "$TICK_FLOOR" ]; then
                  echo "[$(date +%H:%M:%S)] WATCHDOG: $label quiet ${quiet}s, cpu-delta $(( now_ticks - prev_ticks )) ticks/60s, killing $pid" >> "$LOG"
                  touch /tmp/r5_watchdog_fired
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
        persist "$label-partial"
        # next loop iteration runs the pre-launch settle probe; a plain
        # failure still gets a short breather first
        [ -e /tmp/r5_watchdog_fired ] || sleep 20
    done
    echo "STAGE FAILED after 4 attempts: $label" | tee -a "$LOG"
    echo "$label" >> /tmp/r5_failed_stages
    return 1
}

STAGES="tapnet qadata assess_pretext assess reward pretrain agent agent_wild evaluate"

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
    run_stage "E/seeds" demo_multiseed.py --seeds 3 4 5 || true
    run_stage "E/repeat" demo_repeat.py || true
}

phase_f_probes() {
    # Round-5 evidence artifacts: held-out QA corr per tier, committed as
    # results/qa_probe_{tier}.json (VERDICT r4 ask #3).
    [ -e results/qa_probe_hd.json ] || \
        run_stage "F/probe-qa-hd" demo_probe.py qa --tier hd || true
    [ -e results/qa_probe_default.json ] || \
        run_stage "F/probe-qa-default" demo_probe.py qa || true
}

if phase_a_default; then
    phase_d_ytbvos || echo "PHASE D (ytbvos) FORFEITED" | tee -a "$LOG"
    phase_c_ipnet  || echo "PHASE C (ipnet) FORFEITED" | tee -a "$LOG"
    phase_e_extras
else
    echo "PHASE A (default) FORFEITED — D/C/E skipped (need its weights)" | tee -a "$LOG"
fi
phase_f_probes

echo "[$(date +%H:%M:%S)] ALL PHASES DONE" | tee -a "$LOG"
touch /tmp/r5_pipeline.DONE
