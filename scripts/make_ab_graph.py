"""Regenerate the graph-ified amazon-beauty dataset at /tmp/ab_graph.

The reference ships amazon-beauty only in sequential format
(/root/reference/dataset/amazon-beauty/{train,test}.txt, `seqid:item item ...`,
data/loader.py:34-41).  The graph models need the `user item weight` format
(data/loader.py:23-32), so we flatten each training sequence into edges and
take the FIRST item of each test line as that user's single test interaction —
the same convention the reference's own `Sequence` class applies to test data
(data/sequence.py:42-46).

trust.txt is a synthetic social graph (MHCN/SEPT need one; amazon-beauty has
none): seeded uniform pairs, deterministic.

Usage: python scripts/make_ab_graph.py [outdir=/tmp/ab_graph]
"""
import os
import sys

import numpy as np

REF = "/root/reference/dataset/amazon-beauty"


def main(outdir="/tmp/ab_graph"):
    os.makedirs(outdir, exist_ok=True)
    with open(f"{REF}/train.txt") as f, open(f"{outdir}/train.txt", "w") as out:
        users = []
        for line in f:
            seq_id, items = line.strip().split(":")
            users.append(int(seq_id))
            for it in items.split():
                out.write(f"{seq_id} {it} 1\n")
    with open(f"{REF}/test.txt") as f, open(f"{outdir}/test.txt", "w") as out:
        for line in f:
            seq_id, items = line.strip().split(":")
            first = items.split()[0]
            out.write(f"{seq_id} {first} 1\n")
    # synthetic social graph: 12000 directed edges over the training users
    rng = np.random.default_rng(7)
    n_users = max(users)
    with open(f"{outdir}/trust.txt", "w") as out:
        seen = set()
        while len(seen) < 12000:
            u, v = rng.integers(1, n_users + 1, size=2)
            if u != v and (u, v) not in seen:
                seen.add((u, v))
                out.write(f"{u} {v} 1\n")
    print(f"wrote {outdir}: train/test/trust")


if __name__ == "__main__":
    main(*sys.argv[1:])
