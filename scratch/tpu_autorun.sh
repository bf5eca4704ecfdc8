#!/bin/bash
# TPU experiment queue: waits for the remote service, then runs variants.
# Re-checks health before every run (a crashed compile wedges the service
# for ~30-60 min; waiting beats burning the queue).
cd /root/repo
log() { echo "$(date +%H:%M:%S) $1" >> /tmp/autorun_status.log; }
waithealth() {
  while true; do
    ok=$(timeout -k 15 240 python -c "
import jax, jax.numpy as jnp, time
r = jax.jit(lambda a,c: (a*c).sum())(jnp.ones((8,128)), time.time())
print('HEALTH_OK', float(r) > 0)
" 2>&1 | grep -c HEALTH_OK)
    [ "$ok" -ge 1 ] && return 0
    echo "$(date +%H:%M:%S) still down" >> /tmp/autorun_status.log
    sleep 300
  done
}
run2d() {
  waithealth
  timeout -k 30 2400 python scratch/exp2d_lines.py $1 > /tmp/autorun_2d_$1.log 2>&1
  grep -q "solves/s" /tmp/autorun_2d_$1.log
}
run3d() {
  waithealth
  timeout -k 30 3600 python scratch/exp3d.py $1 > /tmp/autorun_3d_$1.log 2>&1
  grep -q "pts/s" /tmp/autorun_3d_$1.log
}
waithealth
log "healthy, starting experiments"
run2d base && log "2d base: $(grep solves/s /tmp/autorun_2d_base.log)" || log "2d base FAILED"
run2d direct_bcr && log "2d direct_bcr: $(grep solves/s /tmp/autorun_2d_direct_bcr.log)" || log "2d direct_bcr FAILED"
run2d direct && log "2d direct: $(grep solves/s /tmp/autorun_2d_direct.log)" || log "2d direct FAILED"
run3d base && log "3d base: $(grep pts/s /tmp/autorun_3d_base.log)" || log "3d base FAILED"
run3d direct_bcr && log "3d direct_bcr: $(grep pts/s /tmp/autorun_3d_direct_bcr.log)" || log "3d direct_bcr FAILED"
run3d direct && log "3d direct: $(grep pts/s /tmp/autorun_3d_direct.log)" || log "3d direct FAILED"
run2d plines && log "2d plines: $(grep solves/s /tmp/autorun_2d_plines.log)" || log "2d plines FAILED"
run3d plines && log "3d plines: $(grep pts/s /tmp/autorun_3d_plines.log)" || log "3d plines FAILED"
run2d plines_d2 && log "2d plines_d2: $(grep solves/s /tmp/autorun_2d_plines_d2.log)" || log "2d plines_d2 FAILED"
run2d direct_dm && log "2d direct_dm: $(grep solves/s /tmp/autorun_2d_direct_dm.log)" || log "2d direct_dm FAILED"
log "queue complete"
waithealth
timeout -k 30 3000 python bench.py > /tmp/autorun_bench.log 2>&1 && log "bench: $(tail -1 /tmp/autorun_bench.log)" || log "bench FAILED"
waithealth
timeout -k 30 3000 python examples/Example_03_dip.py > /tmp/autorun_ex03.log 2>&1 && log "example_03 done" || log "example_03 FAILED"
log "ALL DONE"
