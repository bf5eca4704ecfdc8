#!/bin/bash
# Round-5 TPU follow-up queue A: BM2 shoulder diagnosis, dip 50/55 oracle
# ladder, 2D profiler trace. Health-gated like bisect_lines.sh.
cd /root/repo
LOG=/tmp/queue_r5a.log
: > $LOG
log() { echo "$(date +%H:%M:%S) $*" | tee -a $LOG; }

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
  out=/tmp/r5a_$name.log
  timeout -k 30 "$to" "$@" > "$out" 2>&1
  rc=$?
  log "DONE $name rc=$rc; tail: $(tail -1 "$out")"
}

# 1. BM2 shoulder bisection: is the z=20 2.09% the slabbed stencil kernel,
#    leftover CG residual, or real discretization? (anchor cached after run 1)
run bm2_diag 4800 python scratch/screen_bm2_thin.py default default_nostencil default_tol8 stock
# 2. dip 50/55 rows, stock grid (explicit --nz=193 bypasses the auto-select)
run dip5055_stock 4800 python benchmarks/bm3_oracle.py --dips=50,55 --nz=193
# 3. dip 50/55 rows, high_dip preset
run dip5055_hd 6000 python benchmarks/bm3_oracle.py --dips=50,55 --preset=high_dip
# 4. 2D profiler trace breakdown
run trace2d 3600 python scratch/trace2d.py
log "QUEUE A DONE"
