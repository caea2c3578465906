#!/bin/bash
# Watches the axon relay port; when it opens, waits for stability, then
# runs the round-5 pending queue (unless /tmp/tpu_lock exists — manual
# work holds the chip). The queue itself is self-skipping, so re-running
# is harmless; the qlock dir keeps it to one runner at a time.
cd "$(dirname "$0")/../.."
while true; do
  if timeout 3 bash -c "exec 3<>/dev/tcp/127.0.0.1/8082" 2>/dev/null; then
    date "+%F %T relay port OPEN" >> /tmp/tpu_watch.log
    touch /tmp/tpu_alive
    sleep 30
    if [ ! -e /tmp/tpu_lock ] && [ ! -e /tmp/r5_queue_done ] \
        && mkdir /tmp/tpu_qlock_r5 2>/dev/null; then   # atomic: one runner
      date "+%F %T running round-5 queue" >> /tmp/tpu_watch.log
      bash tools/tpu_pending/queue_r5.sh > /tmp/r5_queue.log 2>&1
      touch /tmp/r5_queue_done
      date "+%F %T round-5 queue finished" >> /tmp/tpu_watch.log
    fi
    sleep 300
  else
    rm -f /tmp/tpu_alive
    sleep 60
  fi
done
