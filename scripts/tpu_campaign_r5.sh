#!/bin/bash
# Round-5 TPU measurement campaign — every VERDICT-r4 measurement item, in
# priority order, on the single real chip. Every stage is resumable
# (per-(method,seed) JSONL cells) and every arm takes the advisory chip
# lock (utils/tpulock.py), so the driver's official bench can never again
# fire into self-inflicted contention: it raises the bench-priority flag
# and sweeps yield at their next arm boundary.
#
# Bounding: `touch /tmp/maxstyle_campaign_stop` makes every sweep exit
# cleanly before its next arm; the shell also checks between stages.
# Logs: /tmp/campaign5/ (transient) + result files under benchmarks/.
set -u
cd /root/repo
mkdir -p /tmp/campaign5
STOP=/tmp/maxstyle_campaign_stop

log() { echo "[campaign5 $(date +%H:%M:%S)] $*"; }
gate() { if [ -e "$STOP" ]; then log "stop file present — campaign ends"; exit 0; fi; }

gate
log "stage 1: converged-budget experiment (VERDICT #1b) — 3000 steps, 192^2, 3 seeds"
timeout 14000 python scripts/ood_method_comparison.py \
  --steps 3000 --hw 192 --batch 10 --seeds 1,2,3 \
  --methods standard,max_style,mix_style \
  --out benchmarks/ood_converged_r5.jsonl \
  >/tmp/campaign5/converged.log 2>&1
log "converged rc=$?"

gate
log "stage 2: B=80 grouped fidelity completion (VERDICT #4) — adv_bias s1,s2 + max_style s2"
timeout 4800 python scripts/ood_method_comparison.py \
  --steps 600 --hw 192 --batch 80 --style_group_size 20 --seeds 1,2 \
  --methods standard,max_style,adv_bias \
  --out benchmarks/ood_b80_r4.jsonl \
  >/tmp/campaign5/b80.log 2>&1
log "b80 rc=$?"

gate
log "stage 3: gamma-column eval-artifact probe (VERDICT #5)"
timeout 3600 python scripts/ood_method_comparison.py \
  --steps 600 --hw 192 --batch 10 --seeds 1,2 \
  --methods standard,adv_bias,mix_style,max_style \
  --domains iid,gamma1.5,gamma,gamma3.0,gamma_raw \
  --out benchmarks/gamma_probe_r5.jsonl \
  >/tmp/campaign5/gamma.log 2>&1
log "gamma rc=$?"

gate
log "stage 4: inner-unroll A/B (VERDICT #6) -> benchmarks/exp_inner_unroll_r5.txt"
timeout 1500 python scripts/exp_inner_unroll.py \
  >benchmarks/exp_inner_unroll_r5.txt 2>/tmp/campaign5/unroll.err
log "unroll rc=$? -> $(tail -2 benchmarks/exp_inner_unroll_r5.txt | tr '\n' ' ')"

gate
log "stage 5: aug-interp bench (VERDICT #6) -> benchmarks/aug_interp_r5.txt"
timeout 900 python scripts/bench_aug_interp.py \
  >benchmarks/aug_interp_r5.txt 2>/tmp/campaign5/interp.err
log "interp rc=$? -> $(tail -2 benchmarks/aug_interp_r5.txt | tr '\n' ' ')"

gate
log "stage 6: batch-scaling curve (VERDICT #6) -> benchmarks/scaling_r5.jsonl"
timeout 1500 python scripts/bench_scaling.py \
  >benchmarks/scaling_r5.jsonl 2>/tmp/campaign5/scaling.err
log "scaling rc=$?"

gate
log "stage 7: second unroll + interp repeats (VERDICT #6 wants two runs each)"
timeout 1500 python scripts/exp_inner_unroll.py \
  >benchmarks/exp_inner_unroll_r5_run2.txt 2>>/tmp/campaign5/unroll.err
log "unroll2 rc=$?"
timeout 900 python scripts/bench_aug_interp.py \
  >benchmarks/aug_interp_r5_run2.txt 2>>/tmp/campaign5/interp.err
log "interp2 rc=$?"
timeout 1500 python scripts/bench_scaling.py \
  >benchmarks/scaling_r5_run2.jsonl 2>>/tmp/campaign5/scaling.err
log "scaling2 rc=$?"

log "campaign complete"
