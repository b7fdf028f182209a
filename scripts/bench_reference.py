#!/usr/bin/env python
"""Measure the REFERENCE implementation's SimGCL training throughput.

Runs /root/reference's own code (model/graph/SimGCL.py train loop +
util/sampler.py host sampler + util/loss_torch.py losses) on the same
deterministic yelp2018-scale synthetic data bench.py uses, with torch on the
host CPU (the only backend torch has in this image; the reference's
``.cuda()`` placement is made a no-op). The resulting examples/s is the
``REF_EXAMPLES_PER_SEC`` constant in bench.py.

Usage: python scripts/bench_reference.py  (requires /root/reference mounted)
"""

import sys
import time

sys.path.insert(0, "/root/reference")
sys.path.insert(0, "/root/repo")

import torch

torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self

# numba isn't installed in this image; the reference only uses @jit on its
# eval-time top-k (util/algorithm.py:144), which this benchmark never calls.
import types

_numba = types.ModuleType("numba")
_numba.jit = lambda *a, **k: (lambda f: f)
sys.modules.setdefault("numba", _numba)

from selfrec_tpu.utils.synth import synth_graph_triples  # noqa: E402

N_WARM, N_BENCH = 2, 10


def main():
    import os

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
    print("batches", N_BENCH, "examples", n_ex, "dt", dt, flush=True)
    print("REF_EXAMPLES_PER_SEC", n_ex / dt, flush=True)


if __name__ == "__main__":
    main()
