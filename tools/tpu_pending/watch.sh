#!/bin/bash
# Watches the axon relay port; when it opens, waits for stability, then
# runs the pending TPU queues (unless /tmp/tpu_lock exists — manual work).
while true; do
  if timeout 3 bash -c "exec 3<>/dev/tcp/127.0.0.1/8082" 2>/dev/null; then
    date "+%F %T relay port OPEN" >> /tmp/tpu_watch.log
    touch /tmp/tpu_alive
    sleep 30
    if [ ! -e /tmp/tpu_lock ] && [ ! -e /tmp/tpu_queue_done ] \
        && mkdir /tmp/tpu_qlock1 2>/dev/null; then   # atomic: one runner
      date "+%F %T running pending queue 1" >> /tmp/tpu_watch.log
      bash /tmp/tpu_pending.sh > /tmp/tpu_queue.log 2>&1
      touch /tmp/tpu_queue_done
      date "+%F %T queue 1 finished" >> /tmp/tpu_watch.log
    fi
    if [ ! -e /tmp/tpu_lock ] && [ -e /tmp/tpu_queue_done ] \
        && [ ! -e /tmp/tpu_queue2_done ] \
        && mkdir /tmp/tpu_qlock2 2>/dev/null; then   # atomic: one runner
      date "+%F %T running pending queue 2 (heavy)" >> /tmp/tpu_watch.log
      bash /tmp/tpu_pending2.sh > /tmp/tpu_queue2.log 2>&1
      touch /tmp/tpu_queue2_done
      date "+%F %T queue 2 finished" >> /tmp/tpu_watch.log
    fi
    sleep 300
  else
    rm -f /tmp/tpu_alive
    sleep 60
  fi
done
