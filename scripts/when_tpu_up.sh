#!/bin/bash
# Round-3 session-2 TPU work queue: wait for the tunnel, then record the
# batched LM-rescore RTFx (ROADMAP open item) and a bench.py sanity number.
# Logs to /tmp/tpu_queue.log; artifacts land in benchmarks/.
cd "$(dirname "$0")/.."
log=/tmp/tpu_queue.log
echo "watcher start $(date)" >> $log
for i in $(seq 1 200); do
  if timeout 240 python -c "import jax; assert jax.devices()[0].platform != 'cpu'" 2>/dev/null; then
    echo "TPU UP $(date)" >> $log
    echo "== bench_lm_rescore --recordings 8" >> $log
    timeout 3000 python benchmarks/bench_lm_rescore.py --recordings 8 >> $log 2>&1
    echo "== bench_lm_rescore exit=$?" >> $log
    echo "== bench.py" >> $log
    timeout 3000 python bench.py >> $log 2>&1
    echo "== bench exit=$? $(date)" >> $log
    exit 0
  fi
  sleep 90
done
echo "watcher gave up $(date)" >> $log
exit 1
