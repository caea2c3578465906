#!/bin/bash
# Round-5 queue supervisor.
#
# Keeps tools/round5/queue.sh running (every item self-skips when its
# evidence exists, so relaunching is idempotent — and resume is now a real
# resume, tests/test_resume_latest_only.py), and HARD-guarantees the TPU is
# free by DEADLINE so the round-end driver bench can grab the single-process
# chip. All process management is pid-tree based (never pattern-matched).
#
# Usage: nohup bash tools/round5/supervise.sh DEADLINE_EPOCH &
set -u
cd "$(dirname "$0")/../.."
DEADLINE=${1:?usage: supervise.sh DEADLINE_EPOCH}
RELAUNCH_CUTOFF=$(( DEADLINE - 900 ))
LOG=/tmp/r5run/supervisor.log
DONE=/tmp/r5_queue_done_v2
mkdir -p /tmp/r5run
echo $$ > /tmp/r5_supervisor.pid
log() { echo "$(date '+%F %T') $*" >> "$LOG"; }
log "supervisor up; deadline $(date -d @"$DEADLINE" '+%T') relaunch-cutoff $(date -d @"$RELAUNCH_CUTOFF" '+%T')"

qpid() { cat /tmp/r5_queue.pid 2>/dev/null; }
alive() { local p; p=$(qpid); [ -n "$p" ] && kill -0 "$p" 2>/dev/null; }

kill_tree() {  # depth-first pid-tree kill: children before parent
  local p=$1 sig=$2 k
  for k in $(ps -o pid= --ppid "$p" 2>/dev/null); do kill_tree "$k" "$sig"; done
  kill "-$sig" "$p" 2>/dev/null
}

while true; do
  now=$(date +%s)
  if [ "$now" -ge "$DEADLINE" ]; then
    if alive; then
      p=$(qpid); log "DEADLINE: killing queue pid tree ($p)"
      kill_tree "$p" TERM; sleep 20; kill_tree "$p" KILL
    fi
    log "deadline reached; TPU free; supervisor exiting"
    exit 0
  fi
  if ! alive; then
    if [ -e "$DONE" ]; then
      log "queue completed (marker); supervisor exiting"
      exit 0
    fi
    if [ "$now" -lt "$RELAUNCH_CUTOFF" ]; then
      log "queue not running; relaunching"
      (
        HARD_END=$DEADLINE setsid bash tools/round5/queue.sh \
          >> /tmp/r5run/queue.log 2>&1
        if tail -5 /tmp/r5run/queue.log | grep -q R5-QUEUE-DONE; then
          touch "$DONE"
        fi
      ) &
      sleep 20   # let it write its pid file before the next alive() check
    else
      log "past relaunch cutoff; idling until deadline"
    fi
  fi
  sleep 60
done
