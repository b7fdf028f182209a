#!/bin/bash
# Round-4 h2h TPU lane (VERDICT r3 items 2+3): our-side convergence runs,
# serialized (single chip). Each run under timeout; rc + wall logged to
# results/h2h/our_lane.log. Reference-side runs go through scripts/ref_run.py
# in a separate CPU lane.
cd /root/repo
mkdir -p /tmp/out_h2h
DATA="--set training.set=/tmp/ab_graph/train.txt --set test.set=/tmp/ab_graph/test.txt"
SEQ="--set training.set=/root/reference/dataset/amazon-beauty/train.txt --set test.set=/root/reference/dataset/amazon-beauty/test.txt"
COMMON="--set max.epoch=30 --set output=/tmp/out_h2h/"

run() {  # run <logname> <env...> -- <main.py args...>
  local log=$1; shift
  local envs=()
  while [ "$1" != "--" ]; do envs+=("$1"); shift; done
  shift
  echo "=== $log start $(date)" >> results/h2h/our_lane.log
  env "${envs[@]}" timeout 1800 python main.py "$@" \
    > "results/h2h/$log" 2>&1
  echo "=== $log done rc=$? $(date)" >> results/h2h/our_lane.log
}

run our_MF_30.log -- --conf conf/MF.yaml $DATA $COMMON
run our_BUIR_30.log -- --conf conf/BUIR.yaml $DATA $COMMON
run our_SelfCF_30.log -- --conf conf/SelfCF.yaml $DATA $COMMON
run our_SSL4Rec_30.log -- --conf conf/SSL4Rec.yaml $DATA $COMMON
run our_MixGCF_30_int8x8_s2.log SELFREC_TPU_DENSE_DTYPE=int8 -- \
  --conf conf/MixGCF.yaml $DATA $COMMON --set seed=2
run our_BERT4Rec_30_s1.log -- --conf conf/BERT4Rec.yaml $SEQ $COMMON --set seed=1
run our_BERT4Rec_30_s2.log -- --conf conf/BERT4Rec.yaml $SEQ $COMMON --set seed=2
run our_NCL_30_s1.log -- --conf conf/NCL.yaml $DATA $COMMON --set seed=1
run our_NCL_30_s2.log -- --conf conf/NCL.yaml $DATA $COMMON --set seed=2
run our_MixGCF_30_s1.log -- --conf conf/MixGCF.yaml $DATA $COMMON --set seed=1
run our_MixGCF_30_s2.log -- --conf conf/MixGCF.yaml $DATA $COMMON --set seed=2
echo "=== LANE COMPLETE $(date)" >> results/h2h/our_lane.log
