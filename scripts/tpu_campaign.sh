#!/bin/bash
# Round-4 TPU measurement campaign: runs every tunnel-blocked measurement
# sequentially on the single real chip, in priority order. Every stage is
# resumable (bench history JSONL, per-(method,seed) OOD cells), so a tunnel
# flake mid-campaign loses only the in-flight arm. Logs to /tmp/campaign/.
set -u
cd /root/repo
mkdir -p /tmp/campaign

log() { echo "[campaign $(date +%H:%M:%S)] $*"; }

log "stage: bench run 2"
timeout 590 python bench.py >/tmp/campaign/bench2.json 2>/tmp/campaign/bench2.err
log "bench2 rc=$? -> $(cat /tmp/campaign/bench2.json)"

log "stage: OOD canonical sweep, priority methods (192^2, 600 steps, b10, seeds 1,2,3)"
timeout 3000 python scripts/ood_method_comparison.py \
  --steps 600 --hw 192 --batch 10 --seeds 1,2,3 \
  --methods standard,max_style,mix_style,RSC,adv_bias \
  --out benchmarks/ood_multiseed_r4.jsonl \
  >/tmp/campaign/ood_prio.log 2>&1
log "ood priority rc=$?"

log "stage: B=80 grouped fidelity (standard,max_style,adv_bias, G=20, seeds 1,2)"
timeout 2400 python scripts/ood_method_comparison.py \
  --steps 600 --hw 192 --batch 80 --style_group_size 20 --seeds 1,2 \
  --methods standard,max_style,adv_bias \
  --out benchmarks/ood_b80_r4.jsonl \
  >/tmp/campaign/ood_b80.log 2>&1
log "ood b80 rc=$?"

log "stage: inner-unroll A/B"
timeout 900 python scripts/exp_inner_unroll.py >/tmp/campaign/unroll.log 2>&1
log "unroll rc=$?"

log "stage: aug-interp bench (bilinear vs cubic)"
timeout 600 python scripts/bench_aug_interp.py >/tmp/campaign/interp.log 2>&1
log "interp rc=$?"

log "stage: OOD canonical sweep, remaining methods"
timeout 3000 python scripts/ood_method_comparison.py \
  --steps 600 --hw 192 --batch 10 --seeds 1,2,3 \
  --methods rand_conv,DSU,adv_noise,latent_DA \
  --out benchmarks/ood_multiseed_r4.jsonl \
  >/tmp/campaign/ood_rest.log 2>&1
log "ood rest rc=$?"

log "stage: batch-scaling throughput"
timeout 900 python scripts/bench_scaling.py >/tmp/campaign/scaling.log 2>&1
log "scaling rc=$?"

log "campaign complete"
