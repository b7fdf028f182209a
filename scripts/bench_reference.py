#!/usr/bin/env python
"""Measure the REFERENCE implementation's training throughput per workload
and record it in REF_BASELINES.json (consumed by bench.py as the
``vs_baseline`` comparator — re-measured on this box, not a frozen
constant; VERDICT round-1 weak item 7).

Runs /root/reference's own code with torch on the host CPU (the only torch
backend in this image; ``.cuda()`` is made a no-op):

- ``simgcl``: model/graph/SimGCL.py train loop + util/sampler.py host
  sampler on the same yelp2018-scale synthetic data bench.py uses.
- ``sasrec``: model/sequential/SASRec.py per-batch loop (forward + BCE +
  backward + Adam) over one full epoch of the reference's own
  amazon-beauty sequences via util/sampler.next_batch_sequence.

MHCN/SEPT have no reference comparator here (TF1-only; no TF1 in the
image) and the reference eval path needs numba (absent) — those stay null.

Usage: python scripts/bench_reference.py [simgcl sasrec ...]
"""

import json
import os
import sys
import time

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/repo")

import torch

torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self

# numba isn't installed in this image; the reference only uses @jit on its
# eval-time top-k (util/algorithm.py:144), which these benchmarks never call.
import types

_numba = types.ModuleType("numba")
_numba.jit = lambda *a, **k: (lambda f: f)
sys.modules.setdefault("numba", _numba)

N_WARM, N_BENCH = 2, 10
REPO = "/root/repo"


def bench_simgcl():
    from selfrec_tpu.utils.synth import synth_graph_triples

    os.chdir("/root/reference")
    from util.conf import ModelConf

    t0 = time.time()
    train, test = synth_graph_triples()
    print("synth done", time.time() - t0, len(train), len(test), flush=True)

    conf = ModelConf("./conf/SimGCL.yaml")
    conf.config["SimGCL"]["n_layer"] = 3  # headline hyperparams README.md:143
    train = [list(t) for t in train]
    test = [list(t) for t in test]

    from model.graph.SimGCL import SimGCL
    from util.sampler import next_batch_pairwise
    from util.loss_torch import bpr_loss, l2_reg_loss

    t0 = time.time()
    rec = SimGCL(conf, train, test)
    print("model built", time.time() - t0, flush=True)
    model = rec.model
    opt = torch.optim.Adam(model.parameters(), lr=rec.lRate)

    n_ex, t0 = 0, None
    for n, batch in enumerate(next_batch_pairwise(rec.data, rec.batch_size)):
        if n == N_WARM:
            t0 = time.time()
            n_ex = 0
        if n == N_WARM + N_BENCH:
            break
        user_idx, pos_idx, neg_idx = batch
        rec_user_emb, rec_item_emb = model()
        user_emb, pos_item_emb, neg_item_emb = (
            rec_user_emb[user_idx],
            rec_item_emb[pos_idx],
            rec_item_emb[neg_idx],
        )
        rec_loss = bpr_loss(user_emb, pos_item_emb, neg_item_emb)
        cl_loss = rec.cl_rate * rec.cal_cl_loss([user_idx, pos_idx])
        batch_loss = rec_loss + l2_reg_loss(rec.reg, user_emb, pos_item_emb) + cl_loss
        opt.zero_grad()
        batch_loss.backward()
        opt.step()
        if t0 is not None:
            n_ex += len(user_idx)
    dt = time.time() - t0
    print("simgcl:", N_BENCH, "batches,", n_ex, "examples,", dt, "s", flush=True)
    return {"examples_per_sec": round(n_ex / dt, 1), "unit": "examples/s",
            "conditions": "torch host CPU, yelp2018-scale synthetic, "
                          "layer=3 batch=2048 emb=64"}


def bench_sasrec():
    os.chdir("/root/reference")
    from util.conf import ModelConf
    from data.loader import FileIO

    conf = ModelConf("./conf/SASRec.yaml")
    train = FileIO.load_data_set("./dataset/amazon-beauty/train.txt", "sequential")
    test = FileIO.load_data_set("./dataset/amazon-beauty/test.txt", "sequential")

    from model.sequential.SASRec import SASRec
    from util.sampler import next_batch_sequence
    from util.loss_torch import l2_reg_loss

    rec = SASRec(conf, train, test)
    model = rec.model
    opt = torch.optim.Adam(model.parameters(), lr=rec.lRate)

    n_seq = len(rec.data.original_seq)
    # one warm batch, then time one full epoch of batches (the analog of
    # bench.py's whole-epoch timing; eval excluded on both sides)
    model.train()
    t0 = None
    n_done = 0
    for epoch in range(2):
        for n, batch in enumerate(
            next_batch_sequence(rec.data, rec.batch_size, max_len=rec.max_len)
        ):
            seq, pos, y, neg_idx, _ = batch
            seq_emb = model.forward(seq, pos)
            rec_loss = rec.calculate_loss(seq_emb, y, neg_idx, pos)
            batch_loss = rec_loss + l2_reg_loss(rec.reg, model.item_emb)
            opt.zero_grad()
            batch_loss.backward()
            opt.step()
            n_done += 1
        if epoch == 0:
            t0 = time.time()  # epoch 0 = warmup
    dt = time.time() - t0
    print("sasrec:", n_seq, "sequences/epoch,", dt, "s/epoch", flush=True)
    return {"examples_per_sec": round(n_seq / dt, 1), "unit": "sequences/s",
            "conditions": "torch host CPU, amazon-beauty sequential, "
                          "batch=256 max_len=50 blocks=2"}


WORKLOADS = {"simgcl": bench_simgcl, "sasrec": bench_sasrec}


def main():
    names = sys.argv[1:] or list(WORKLOADS)
    out_path = os.path.join(REPO, "REF_BASELINES.json")
    results = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            results = json.load(f)
    for name in names:
        print(f"=== {name} ===", flush=True)
        r = WORKLOADS[name]()
        r["measured"] = time.strftime("%Y-%m-%d")
        results[name] = r
        with open(out_path, "w") as f:
            json.dump(results, f, indent=2)
        print(name, "->", r, flush=True)
    print("wrote", out_path, flush=True)


if __name__ == "__main__":
    main()
