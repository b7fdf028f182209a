"""Run the reference implementation (torch, host CPU) for head-to-head parity.

Patches `.cuda()` to a no-op and stubs numba/faiss so the reference's own code
(/root/reference/model/...) runs unmodified on CPU.  Graph models run on the
graph-ified amazon-beauty (scripts/make_ab_graph.py); sequential models run on
the reference's own amazon-beauty sequential files.

Usage:
  python scripts/ref_run.py --model SimGCL --epochs 20 [--set key value ...]

Per-epoch metric lines from the reference's fast_evaluation print to stdout;
tee to a log for PARITY.md.
"""
import argparse
import os
import sys
import types

sys.path.insert(0, "/root/reference")

import torch

torch.Tensor.cuda = lambda self, *a, **k: self
torch.nn.Module.cuda = lambda self, *a, **k: self

numba = types.ModuleType("numba")
numba.jit = lambda *a, **k: (lambda f: f)
sys.modules.setdefault("numba", numba)


class _FaissKmeans:
    """CPU stand-in for faiss.Kmeans (reference NCL.py:35-44) using sklearn-free numpy Lloyd."""

    def __init__(self, d, k, gpu=False):
        self.d, self.k = d, k
        self.centroids = None

    @staticmethod
    def _d2(x, c):
        # ||x-c||^2 via the matmul expansion — the broadcasted (n, k, d)
        # difference tensor is ~23 GB at NCL's n=22k, k=2000, d=64 and
        # effectively hangs the run; this is a (n, k) matrix instead.
        import numpy as np

        x = np.asarray(x, dtype=np.float32)
        c = np.asarray(c, dtype=np.float32)
        return (
            (x * x).sum(1)[:, None]
            - 2.0 * (x @ c.T)
            + (c * c).sum(1)[None, :]
        )

    def train(self, x):
        import numpy as np

        x = np.asarray(x, dtype=np.float32)
        rng = np.random.default_rng(0)
        c = x[rng.choice(len(x), self.k, replace=False)].copy()
        for _ in range(20):
            a = self._d2(x, c).argmin(1)
            sums = np.zeros_like(c)
            np.add.at(sums, a, x)
            counts = np.bincount(a, minlength=self.k).astype(np.float32)
            nz = counts > 0
            c[nz] = sums[nz] / counts[nz, None]
        self.centroids = c
        # faiss.Kmeans exposes a trained `index`; NCL.py:40 calls
        # `kmeans.index.search(x, 1)` — mirror that exact surface.
        self.index = _FaissIndex(self.centroids)


class _FaissIndex:
    """Stand-in for the `kmeans.index` flat-L2 index (NCL.py:40)."""

    def __init__(self, centroids):
        self.centroids = centroids

    def search(self, x, n):
        d2 = _FaissKmeans._d2(x, self.centroids)
        if n == 1:
            return d2.min(1)[:, None], d2.argmin(1)[:, None].astype("int64")
        import numpy as np

        idx = np.argsort(d2, axis=1)[:, :n]
        return np.take_along_axis(d2, idx, 1), idx.astype("int64")


faiss_mod = types.ModuleType("faiss")
faiss_mod.Kmeans = _FaissKmeans
sys.modules.setdefault("faiss", faiss_mod)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--epochs", type=int, required=True)
    ap.add_argument("--data", default="/tmp/ab_graph")
    ap.add_argument("--out", default="/tmp/ref_out")
    ap.add_argument("--set", nargs=2, action="append", default=[],
                    metavar=("KEY", "VALUE"), help="override nested model key")
    args = ap.parse_args()

    os.chdir("/root/reference")
    from util.conf import ModelConf
    from data.loader import FileIO

    conf = ModelConf(f"./conf/{args.model}.yaml")
    conf.config["max.epoch"] = args.epochs
    os.makedirs(args.out, exist_ok=True)
    conf.config["output"] = args.out + "/"
    for k, v in args.set:
        try:
            v = int(v)
        except ValueError:
            try:
                v = float(v)
            except ValueError:
                pass
        if k in conf.config:
            conf.config[k] = v
        else:
            conf.config[args.model][k] = v

    mtype = conf.config["model"]["type"]
    kwargs = {}
    if mtype == "sequential":
        train = FileIO.load_data_set("./dataset/amazon-beauty/train.txt", "sequential")
        test = FileIO.load_data_set("./dataset/amazon-beauty/test.txt", "sequential")
    else:
        train = FileIO.load_data_set(f"{args.data}/train.txt", "graph")
        test = FileIO.load_data_set(f"{args.data}/test.txt", "graph")
        if conf.contain("social.data"):
            kwargs["social.data"] = FileIO.load_social_data(f"{args.data}/trust.txt")

    mod = __import__(f"model.{mtype}.{args.model}", fromlist=[args.model])
    rec = getattr(mod, args.model)(conf, train, test, **kwargs)
    rec.execute()


if __name__ == "__main__":
    main()
