#!/usr/bin/env python
"""Social-engine convergence head-to-head: MHCN / SEPT (VERDICT r3 item 2).

The reference MHCN/SEPT are TF1-only (no TF1 in this image), so the ref side
trains the op-for-op torch transliterations of their graphs — the same
transliterations scripts/bench_reference.py measures throughput on
(MHCN.py:27-201, SEPT.py:33-160 — losses, motif algebra, per-epoch
graph_reconstruction all verbatim) — to convergence on the synthetic
quarter-douban workload, with the REFERENCE'S OWN fast_evaluation printing
(util.evaluation.ranking_evaluation over a -10e8 rated-masked full rank,
graph_recommender.py:38-58). HONEST LABEL: this is a transliteration, not
the reference's own TF1 session; op-level parity of the transliteration is
asserted in tests/test_social_oracle.py.

The our side runs our models on the SAME synthetic triples (same seeds)
with our fast_evaluation (reference-parity metrics).

Usage:
  python scripts/h2h_social.py --model MHCN --side ref --epochs 30
  python scripts/h2h_social.py --model SEPT --side ours --epochs 30
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def synth_quarter_douban():
    from selfrec_tpu.utils.synth import (
        DOUBAN_INTERACTIONS, DOUBAN_ITEMS, DOUBAN_USERS,
        synth_graph_triples, synth_social_triples,
    )

    train, test = synth_graph_triples(
        DOUBAN_USERS // 4, DOUBAN_ITEMS // 4, DOUBAN_INTERACTIONS // 4,
        seed=1237)
    social = synth_social_triples(
        n_users=DOUBAN_USERS // 4, n_relations=169150 // 4)
    return train, test, social


# --------------------------------------------------------------------------
# ref side: torch transliterations (CPU)
# --------------------------------------------------------------------------

def ref_eval(data, final_u, final_i, epoch):
    """The reference's fast_evaluation over precomputed tables: full-rank
    scores, rated items masked with -10e8 (graph_recommender.py:49),
    top-20, util.evaluation.ranking_evaluation printout."""
    import numpy as np
    import torch

    from util.evaluation import ranking_evaluation

    with torch.no_grad():
        scores = (final_u @ final_i.T).numpy()
    for uname, rated in data.training_set_u.items():
        u = data.user[uname]
        cols = [data.item[i] for i in rated if i in data.item]
        scores[u, cols] = -10e8
    k = 20
    top = np.argpartition(-scores, k, axis=1)[:, :k]
    rec_list = {}
    for uname in data.test_set:
        u = data.user[uname]
        row = top[u]
        row = row[np.argsort(-scores[u, row], kind="stable")]
        rec_list[uname] = [(data.id2item[int(i)], float(scores[u, i]))
                           for i in row]
    measure = ranking_evaluation(data.test_set, rec_list, [k])
    perf = {m.strip().split(":")[0]: float(m.strip().split(":")[1])
            for m in measure[1:]}
    print(f"Epoch: {epoch + 1}, " + ", ".join(
        f"{k_}: {v}" for k_, v in perf.items()), flush=True)
    return perf


def run_ref(model_name, epochs):
    import numpy as np
    import scipy.sparse as sp
    import torch
    import torch.nn.functional as F

    train, test, social = synth_quarter_douban()
    os.chdir("/root/reference")
    from util.conf import ModelConf
    from data.ui_graph import Interaction
    from data.social import Relation
    from util.sampler import next_batch_pairwise
    from util.loss_torch import bpr_loss

    conf = ModelConf(f"./conf/{model_name}.yaml")
    data = Interaction(conf, [list(t) for t in train], [list(t) for t in test])
    relation = Relation(conf, [list(t) for t in social], data.user)
    args = conf[model_name]
    n_layers = int(args["n_layer"])
    ss_rate = float(args["ss_rate"])
    emb_size = int(conf["embedding.size"])
    l_rate = float(conf["learning.rate"])
    reg = float(conf["reg.lambda"])
    batch_size = int(conf["batch.size"])
    n_u, n_i = data.user_num, data.item_num

    def to_torch(m):
        c = sp.coo_matrix(m)
        idx = torch.LongTensor(np.vstack([c.row, c.col]))
        return torch.sparse_coo_tensor(
            idx, torch.FloatTensor(c.data.astype(np.float32)),
            c.shape).coalesce()

    if model_name == "MHCN":
        # motif hypergraphs: reference build_hyper_adj_mats (MHCN.py:27-55)
        S = relation.get_social_mat()
        Y = data.interaction_mat
        B = S.multiply(S.T)
        U = S - B
        C1 = (U.dot(U)).multiply(U.T)
        A1 = C1 + C1.T
        C2 = ((B.dot(U)).multiply(U.T) + (U.dot(B)).multiply(U.T)
              + (U.dot(U)).multiply(B))
        A2 = C2 + C2.T
        C3 = ((B.dot(B)).multiply(U) + (B.dot(U)).multiply(B)
              + (U.dot(B)).multiply(B))
        A3 = C3 + C3.T
        A4 = (B.dot(B)).multiply(B)
        C5 = ((U.dot(U)).multiply(U) + (U.dot(U.T)).multiply(U)
              + (U.T.dot(U)).multiply(U))
        A5 = C5 + C5.T
        A6 = ((U.dot(B)).multiply(U) + (B.dot(U.T)).multiply(U.T)
              + (U.T.dot(U)).multiply(B))
        A7 = ((U.T.dot(B)).multiply(U.T) + (B.dot(U)).multiply(U)
              + (U.dot(U.T)).multiply(B))
        A8 = (Y.dot(Y.T)).multiply(B)
        A9 = (Y.dot(Y.T)).multiply(U)
        A9 = A9 + A9.T
        A10 = Y.dot(Y.T) - A8 - A9
        H_s = sum([A1, A2, A3, A4, A5, A6, A7])
        H_s = H_s.multiply(1.0 / np.maximum(
            H_s.sum(axis=1).reshape(-1, 1), 1e-12))
        H_j = sum([A8, A9])
        H_j = H_j.multiply(1.0 / np.maximum(
            H_j.sum(axis=1).reshape(-1, 1), 1e-12))
        H_p = A10.multiply(A10 > 3)
        H_p = H_p.multiply(1.0 / np.maximum(
            H_p.sum(axis=1).reshape(-1, 1), 1e-12))
        H_s_t, H_j_t, H_p_t = to_torch(H_s), to_torch(H_j), to_torch(H_p)
        R_t = to_torch(data.normalize_graph_mat(data.interaction_mat))
        R_T_t = to_torch(data.normalize_graph_mat(data.interaction_mat).T)

        g = torch.Generator().manual_seed(0)
        P = {
            "user_emb": torch.nn.Parameter(torch.nn.init.xavier_uniform_(
                torch.empty(n_u, emb_size))),
            "item_emb": torch.nn.Parameter(torch.nn.init.xavier_uniform_(
                torch.empty(n_i, emb_size))),
            "attention": torch.nn.Parameter(torch.nn.init.xavier_uniform_(
                torch.empty(1, emb_size))),
            "attention_mat": torch.nn.Parameter(
                torch.nn.init.xavier_uniform_(
                    torch.empty(emb_size, emb_size))),
        }
        for c in range(1, 5):
            for pre in ("gating", "sgating"):
                P[f"{pre}{c}"] = torch.nn.Parameter(
                    torch.nn.init.xavier_uniform_(
                        torch.empty(emb_size, emb_size)))
                P[f"{pre}_bias{c}"] = torch.nn.Parameter(
                    torch.nn.init.xavier_uniform_(torch.empty(1, emb_size)))

        def gate(em, c, pre="gating"):
            return em * torch.sigmoid(em @ P[f"{pre}{c}"] + P[f"{pre}_bias{c}"])

        def attention(*chans):
            ws = [((P["attention"] * (e @ P["attention_mat"])).sum(1))
                  for e in chans]
            score = torch.softmax(torch.stack(ws, dim=1), dim=1)
            return sum(score[:, i:i + 1] * chans[i]
                       for i in range(len(chans))), score

        def mim(em, adj):
            def row_shuffle(e):
                return e[torch.randperm(e.shape[0], generator=g)]

            def row_col_shuffle(e):
                e2 = e[:, torch.randperm(e.shape[1], generator=g)]
                return e2[torch.randperm(e2.shape[0], generator=g)]

            edge = torch.sparse.mm(adj, em)
            pos = (em * edge).sum(1)
            neg1 = (row_shuffle(em) * edge).sum(1)
            neg2 = (row_col_shuffle(edge) * em).sum(1)
            local = (-torch.log(torch.sigmoid(pos - neg1))
                     - torch.log(torch.sigmoid(neg1 - neg2))).sum()
            graph = edge.mean(0)
            pos_g = (edge * graph).sum(1)
            neg1_g = (row_col_shuffle(edge) * graph).sum(1)
            return local + (-torch.log(torch.sigmoid(pos_g - neg1_g))).sum()

        def forward():
            u1, u2, u3 = (gate(P["user_emb"], c) for c in (1, 2, 3))
            simple = gate(P["user_emb"], 4)
            item = P["item_emb"]
            a1, a2, a3, a_s, a_i = [u1], [u2], [u3], [simple], [item]
            for _ in range(n_layers):
                mixed = attention(u1, u2, u3)[0] + simple / 2
                u1 = torch.sparse.mm(H_s_t, u1)
                a1.append(F.normalize(u1, dim=1))
                u2 = torch.sparse.mm(H_j_t, u2)
                a2.append(F.normalize(u2, dim=1))
                u3 = torch.sparse.mm(H_p_t, u3)
                a3.append(F.normalize(u3, dim=1))
                new_item = torch.sparse.mm(R_T_t, mixed)
                a_i.append(F.normalize(new_item, dim=1))
                simple = torch.sparse.mm(R_t, item)
                a_s.append(F.normalize(simple, dim=1))
                item = new_item
            u1, u2, u3 = (torch.stack(a).sum(0) for a in (a1, a2, a3))
            simple = torch.stack(a_s).sum(0)
            item = torch.stack(a_i).sum(0)
            final_u = attention(u1, u2, u3)[0] + simple / 2
            ss = (mim(gate(final_u, 1, "sgating"), H_s_t)
                  + mim(gate(final_u, 2, "sgating"), H_j_t)
                  + mim(gate(final_u, 3, "sgating"), H_p_t))
            return final_u, item, ss_rate * ss

        opt = torch.optim.Adam(P.values(), lr=l_rate)
        for epoch in range(epochs):
            t0 = time.time()
            for n, batch in enumerate(next_batch_pairwise(data, batch_size)):
                user_idx, pos_idx, neg_idx = batch
                final_u, final_i, ss_loss = forward()
                ue, pe, ne = (final_u[user_idx], final_i[pos_idx],
                              final_i[neg_idx])
                rec_loss = bpr_loss(ue, pe, ne)
                # reference MHCN.py:186-188: reg over self.weights — the
                # gating/attention params ONLY (user/item embeddings are
                # NOT in the weights dict, MHCN.py:58-73) — plus the batch
                # rows. Regging the full tables collapses training.
                reg_loss = reg * sum(
                    (w ** 2).sum() / 2 for k, w in P.items()
                    if k not in ("user_emb", "item_emb"))
                reg_loss = reg_loss + reg * (
                    (ue ** 2).sum() / 2 + (pe ** 2).sum() / 2
                    + (ne ** 2).sum() / 2)
                loss = rec_loss + reg_loss + ss_loss
                opt.zero_grad()
                loss.backward()
                opt.step()
            print(f"epoch {epoch + 1} trained in {time.time()-t0:.1f}s, "
                  f"loss {loss.item():.4f}", flush=True)
            with torch.no_grad():
                final_u, final_i, _ = forward()
            ref_eval(data, final_u, final_i, epoch)
        return

    # ---- SEPT ----
    from scipy.sparse import eye

    drop_rate = float(args["drop_rate"])
    ins_cnt = int(args["ins_cnt"])
    S = relation.get_birectional_social_mat()
    Y = data.interaction_mat
    social_mat = (S.dot(S)).multiply(S) + eye(n_u, dtype=np.float32)
    sharing_mat = (Y.dot(Y.T)).multiply(S) + eye(n_u, dtype=np.float32)
    social_t = to_torch(relation.normalize_graph_mat(social_mat))
    sharing_t = to_torch(relation.normalize_graph_mat(sharing_mat))
    norm_adj_t = to_torch(data.norm_adj)

    def epoch_sub_adj(epoch):
        # reference graph_reconstruction per epoch (SEPT.py:161-167)
        rng = np.random.default_rng(epoch)
        coo = Y.tocoo()
        keep = rng.random(coo.nnz) >= drop_rate
        dropped = sp.csr_matrix(
            (coo.data[keep], (coo.row[keep], coo.col[keep])), shape=Y.shape)
        tmp = sp.bmat([[None, dropped], [dropped.T, None]], format="csr")
        return to_torch(data.normalize_graph_mat(tmp))

    P = {
        "user_emb": torch.nn.Parameter(torch.nn.init.xavier_uniform_(
            torch.empty(n_u, emb_size))),
        "item_emb": torch.nn.Parameter(torch.nn.init.xavier_uniform_(
            torch.empty(n_i, emb_size))),
    }

    def encoder(ego, adj_t):
        embs, e = [ego], ego
        for _ in range(n_layers):
            e = F.normalize(torch.sparse.mm(adj_t, e), dim=1)
            embs.append(e)
        return torch.stack(embs).sum(0)

    # two optimizers with separate state, like the reference's
    # v1_opt (rec-only warm-up) / v2_opt (joint), SEPT.py:155-158
    opt1 = torch.optim.Adam(P.values(), lr=l_rate)
    opt2 = torch.optim.Adam(P.values(), lr=l_rate)
    for epoch in range(epochs):
        t0 = time.time()
        joint = epoch > epochs / 3  # SEPT.py:163 (0-indexed epoch)
        sub_t = epoch_sub_adj(epoch) if joint else None
        for n, batch in enumerate(next_batch_pairwise(data, batch_size)):
            user_idx, pos_idx, neg_idx = batch
            ego = torch.cat([P["user_emb"], P["item_emb"]], dim=0)
            rec_all = encoder(ego, norm_adj_t)
            rec_u, rec_i = rec_all[:n_u], rec_all[n_u:]
            ue, pe, ne = rec_u[user_idx], rec_i[pos_idx], rec_i[neg_idx]
            rec_loss = bpr_loss(ue, pe, ne) + reg * (
                (P["user_emb"] ** 2).sum() / 2
                + (P["item_emb"] ** 2).sum() / 2)
            if not joint:
                opt1.zero_grad()
                rec_loss.backward()
                opt1.step()
                loss = rec_loss
                continue
            aug_all = encoder(ego, sub_t)
            aug_u = aug_all[:n_u]
            friend = encoder(P["user_emb"], social_t)
            sharing = encoder(P["user_emb"], sharing_t)
            uniq = torch.unique(torch.LongTensor(user_idx))
            aug_n = F.normalize(aug_u[uniq], dim=1)

            def label_pred(emb):
                return torch.softmax(
                    F.normalize(emb[uniq], dim=1) @ aug_n.T, dim=1)

            def nd(pos_idx_k, emb):
                e = F.normalize(emb[uniq], dim=1)
                pos = (e.unsqueeze(1) * aug_n[pos_idx_k]).sum(2)
                pos_score = torch.exp(pos / 0.1).sum(1)
                ttl_score = torch.exp(e @ aug_n.T / 0.1).sum(1)
                return -torch.log(pos_score / ttl_score).sum()

            p_soc, p_sha, p_rec = (label_pred(x)
                                   for x in (friend, sharing, rec_u))
            f_pos = torch.topk((p_sha + p_rec) / 2, ins_cnt).indices
            sh_pos = torch.topk((p_soc + p_rec) / 2, ins_cnt).indices
            r_pos = torch.topk((p_soc + p_sha) / 2, ins_cnt).indices
            nd_loss = nd(f_pos, friend) + nd(sh_pos, sharing) + nd(r_pos, rec_u)
            loss = rec_loss + ss_rate * nd_loss
            opt2.zero_grad()
            loss.backward()
            opt2.step()
        print(f"epoch {epoch + 1} trained in {time.time()-t0:.1f}s, "
              f"loss {loss.item():.4f}", flush=True)
        with torch.no_grad():
            ego = torch.cat([P["user_emb"], P["item_emb"]], dim=0)
            rec_all = encoder(ego, norm_adj_t)
        ref_eval(data, rec_all[:n_u], rec_all[n_u:], epoch)


# --------------------------------------------------------------------------
# our side
# --------------------------------------------------------------------------

def run_ours(model_name, epochs, seed=0):
    from bench import _graph_conf
    from selfrec_tpu.models import get_model_class

    train, test, social = synth_quarter_douban()
    extra = ({"n_layer": 2, "ss_rate": 0.01} if model_name == "MHCN"
             else {"n_layer": 2, "ss_rate": 0.005, "drop_rate": 0.3,
                   "ins_cnt": 10})
    conf = _graph_conf(model_name, extra,
                       **{"social.data": "<synthetic>",
                          "max.epoch": epochs, "seed": seed})
    model = get_model_class(model_name)(conf, train, test,
                                        **{"social.data": social})
    model.execute()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True, choices=["MHCN", "SEPT"])
    ap.add_argument("--side", required=True, choices=["ref", "ours"])
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--seed", type=int, default=0,
                    help="model seed (ours side only; data stays seed-1237)")
    args = ap.parse_args()
    if args.side == "ref":
        import types

        numba = types.ModuleType("numba")
        numba.jit = lambda *a, **k: (lambda f: f)
        sys.modules.setdefault("numba", numba)
        sys.path.insert(0, "/root/reference")
        run_ref(args.model, args.epochs)
    else:
        run_ours(args.model, args.epochs, args.seed)


if __name__ == "__main__":
    main()
