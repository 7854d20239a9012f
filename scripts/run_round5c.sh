#!/usr/bin/env bash
# Round-5c: complete the reference table's FULL 3-backbone x 2-dataset cross
# product — matchnet and ipnet over the converted ytbvos tree (reference
# results/{MANet,IPN}/*/ytbvos/), same tapnet-trained agent/AssessNet
# transfer semantics as the synthetic matrices. Waits for round-5b (which
# retrains matchnet); inherits its watchdog/settle/persist machinery by
# sourcing the same patterns.
set -u
cd "$(dirname "$0")/.."

for tag in r5 r5b; do
    if [ -f /tmp/${tag}_pipeline.pid ] \
       && kill -0 "$(cat /tmp/${tag}_pipeline.pid)" 2>/dev/null \
       && [ "$(cat /tmp/${tag}_pipeline.pid)" != "$$" ]; then
        echo "waiting for ${tag} pipeline $(cat /tmp/${tag}_pipeline.pid)..."
        while kill -0 "$(cat /tmp/${tag}_pipeline.pid)" 2>/dev/null; do sleep 30; done
    fi
done

echo $$ > /tmp/r5c_pipeline.pid
LOG=/tmp/r5c_pipeline.log
LOCK=/tmp/r4_persist.lock
DIRS="weights_demo weights_demo_hd train_demo train_demo_hd results"

persist() {
    local label=$1
    (
        flock 9 || exit 1
        local d staged=0 have=""
        for d in $DIRS; do
            [ -e "$d" ] || continue
            git add -A -- "$d" 2>>"$LOG" || continue
            if git ls-files -- "$d" | grep -q .; then staged=1; have="$have $d"; fi
        done
        [ "$staged" = 1 ] || exit 0
        if git diff --cached --quiet -- $have 2>/dev/null; then exit 0; fi
        git commit -q -m "pipeline: persist training state ($label)" -- $have \
            2>>"$LOG" || echo "persist: commit ($label) FAILED" >> "$LOG"
    ) 9>"$LOCK"
}

QUIET_LIMIT=480
TICK_FLOOR=50
cpu_ticks() { awk '{print $14+$15}' "/proc/$1/stat" 2>/dev/null || echo -1; }

settle_probe() {
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
        echo "[$(date +%H:%M:%S)] settle probe try $try: NOT answering, backoff $((30 * try))s" >> "$LOG"
        sleep $((30 * try))
    done
    return 1
}

run_stage() {
    local label=$1; shift
    local attempt rc pid wd
    for attempt in 1 2 3 4; do
        settle_probe
        echo "[$(date +%H:%M:%S)] >>> $label (attempt $attempt)" | tee -a "$LOG"
        python -u "scripts/$1" "${@:2}" >> "$LOG" 2>&1 &
        pid=$!
        echo $pid > /tmp/r5c_stage.pid
        rm -f /tmp/r5c_watchdog_fired
        (
          prev_ticks=-1
          while kill -0 "$pid" 2>/dev/null; do
              sleep 60
              quiet=$(( $(date +%s) - $(stat -c %Y "$LOG") ))
              now_ticks=$(cpu_ticks "$pid")
              if [ "$quiet" -gt "$QUIET_LIMIT" ] && [ "$now_ticks" -ge 0 ] \
                 && [ "$prev_ticks" -ge 0 ] \
                 && [ $(( now_ticks - prev_ticks )) -lt "$TICK_FLOOR" ]; then
                  echo "[$(date +%H:%M:%S)] WATCHDOG: $label killing $pid" >> "$LOG"
                  touch /tmp/r5c_watchdog_fired
                  kill "$pid" 2>/dev/null; sleep 10; kill -9 "$pid" 2>/dev/null
                  break
              fi
              prev_ticks=$now_ticks
          done
        ) &
        wd=$!
        wait "$pid"; rc=$?
        kill "$wd" 2>/dev/null
        echo "[$(date +%H:%M:%S)] <<< $label rc=$rc" | tee -a "$LOG"
        if [ "$rc" -eq 0 ]; then persist "$label"; return 0; fi
        persist "$label-partial"
        [ -e /tmp/r5c_watchdog_fired ] || sleep 20
    done
    echo "STAGE FAILED after 4 attempts: $label" | tee -a "$LOG"
    return 1
}

if [ -e weights_demo/matchnet.orbax ]; then
    run_stage "T/ytbvos-matchnet" demo_ytbvos.py evaluate --vos matchnet \
        || echo "T/ytbvos-matchnet FAILED" | tee -a "$LOG"
else
    echo "matchnet.orbax missing — skipping matchnet ytbvos" | tee -a "$LOG"
fi
run_stage "T/ytbvos-ipnet" demo_ytbvos.py evaluate --vos ipnet \
    || echo "T/ytbvos-ipnet FAILED" | tee -a "$LOG"

echo "[$(date +%H:%M:%S)] ROUND-5C DONE" | tee -a "$LOG"
touch /tmp/r5c_pipeline.DONE
