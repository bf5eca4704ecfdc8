#!/bin/bash
# Round-5 TPU follow-up queue B: structural 2D latency variants (VERDICT r4
# item 5) after queue A finishes. Health-gated; chains off queue A's log.
cd /root/repo
LOG=/tmp/queue_r5b.log
: > $LOG
log() { echo "$(date +%H:%M:%S) $*" | tee -a $LOG; }

# Wait for queue A (if running) so the runs never contend for the one core.
while [ -f /tmp/queue_r5a.log ] && ! grep -q "QUEUE A DONE" /tmp/queue_r5a.log; do
  sleep 60
done

waithealth() {
  while true; do
    ok=$(timeout -k 15 240 python -c "
import jax, jax.numpy as jnp, time
r = jax.jit(lambda a,c: (a*c).sum())(jnp.ones((8,128)), time.time())
print('HEALTH_OK', float(r) > 0)
" 2>&1 | grep -c HEALTH_OK)
    [ "$ok" -ge 1 ] && return 0
    log "service down, waiting 300s"
    sleep 300
  done
}

run() {  # name timeout cmd...
  name=$1; to=$2; shift 2
  waithealth
  log "START $name"
  out=/tmp/r5b_$name.log
  timeout -k 30 "$to" "$@" > "$out" 2>&1
  rc=$?
  log "DONE $name rc=$rc; tail: $(tail -1 "$out")"
}

# NOTE: the bench workload is ONE chunk (41 batches < chunk_size 96), so the
# win* variants mostly bound the host-staging overlap; the smoother variants
# change the within-program op mix where the 2D floor actually lives.
run struct2d 4800 python scratch/screen2d_tpu.py base win1 jacobi_deg5 line_r win6_devmesh
log "QUEUE B DONE"
