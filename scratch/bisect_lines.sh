#!/bin/bash
# Clean serialized bisection of the pallas_lines2d TPU worker fault.
# Every case runs in its own process; a health gate runs BEFORE each case so
# a worker crash (which wedges the service for up to ~30-60 min) cannot
# contaminate the next case's verdict. Exit-code legend per case:
#   ok        -> case printed its OK line
#   crash     -> JaxRuntimeError UNAVAILABLE (worker crashed)
#   hang      -> timeout killed it while the service was healthy
cd /root/repo
LOG=/tmp/bisect_lines.log
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

runcase() {  # name timeout args...
  name=$1; to=$2; shift 2
  waithealth
  log "START $name ($*)"
  out=/tmp/bisect_$name.log
  timeout -k 30 "$to" python scratch/repro_lines_tpu2.py "$@" > "$out" 2>&1
  rc=$?
  if grep -q "^OK" "$out"; then
    log "RESULT $name: OK $(grep '^OK' "$out" | head -1)"
  elif grep -q "UNAVAILABLE: TPU worker" "$out"; then
    log "RESULT $name: CRASH (worker died)"
  elif [ $rc -ge 124 ]; then
    log "RESULT $name: HANG/TIMEOUT rc=$rc"
  else
    log "RESULT $name: FAIL rc=$rc $(tail -2 "$out" | head -1)"
  fi
}

# Round-5 findings so far (see /tmp/bisect_lines.log history):
#   lvl1/both0 standalone: PASS.  fori (composite in fori_loop(3)): HANG,
#   and the hang WEDGED the service ~40 min — each faulting probe is
#   expensive, so only decision-relevant cases below. The production MG
#   unrolls Chebyshev and the V-cycle; the only XLA loop is CG's while_loop,
#   and the f32 2D stencil kernel already runs inside that loop fine — the
#   discriminators vs that working kernel are: bf16 factor operand, the
#   3-dim launch grid with tiled block maps, and pltpu.roll (radial only).
runcase cheb_small   900 cheb 8 4        # unrolled recurrence, no XLA loop
runcase while_small  900 while 8 4       # composite inside while_loop
runcase fori_ax      900 fori_ax 8 4     # ONLY the axial kernel in fori (no roll)
runcase fori_rad     900 fori_rad 8 4    # ONLY the radial kernel in fori
runcase fori_f32     900 fori_f32 8 4    # composite in fori, f32 factors
log "BISECT DONE"
