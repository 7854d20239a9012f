#!/usr/bin/env bash
# Companion to a running run_round4.sh whose in-process persist() predates
# the pathspec fix (bash parses functions at launch; the live pipeline
# stages training state but its `git commit -- <missing-pathspec>` is
# fatal). This loop commits the training dirs with the FIXED logic, under
# the same flock, until the pipeline finishes or dies.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r4_persist_helper.log
LOCK=/tmp/r4_persist.lock
DIRS="weights_demo weights_demo_hd train_demo train_demo_hd results"

persist_once() {
    (
        flock 9 || exit 1
        local d staged=0 have=""
        for d in $DIRS; do
            [ -e "$d" ] || continue
            if ! git add -A -- "$d" 2>>"$LOG"; then
                echo "helper: git add $d FAILED" >> "$LOG"; continue
            fi
            if git ls-files -- "$d" | grep -q .; then staged=1; have="$have $d"; fi
        done
        [ "$staged" = 1 ] || exit 0
        if git diff --cached --quiet -- $have 2>/dev/null; then exit 0; fi
        git commit -q -m "pipeline: persist training state (helper)" -- $have \
            2>>"$LOG" || echo "helper: git commit FAILED" >> "$LOG"
    ) 9>"$LOCK"
}

while true; do
    persist_once
    [ -e /tmp/r4_pipeline.DONE ] && exit 0
    pid=$(cat /tmp/r4_pipeline.pid 2>/dev/null || echo 0)
    kill -0 "$pid" 2>/dev/null || { persist_once; exit 0; }
    sleep 300
done
