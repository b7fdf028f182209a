"""Recommender runtime: the L2 layer.

Same template-method pipeline as the reference ``Recommender.execute()``
(/root/reference/base/recommender.py:73-83: initializing_log →
print_model_info → build → train → test → evaluate) and the same
best-by-majority-vote ``fast_evaluation`` bookkeeping
(base/graph_recommender.py:81-104), rebuilt around a TPU execution model:

- one backend (JAX). Model math lives in pure functions of (params, batch,
  key); the whole epoch runs as ONE jit-compiled ``lax.scan`` over fixed-size
  batches (one device dispatch per epoch, vs one per batch + host sampling in
  the reference).
- negative sampling happens on device inside the scanned step
  (ops/sampling.py), not in host Python.
- evaluation is batched full-rank scoring + lax.top_k (ops/ranking.py), not a
  per-user loop.
"""

from __future__ import annotations

import os
from os.path import abspath
from time import localtime, strftime, time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from selfrec_tpu.data.interaction import Interaction
from selfrec_tpu.data.sequence import Sequence
from selfrec_tpu.data import io
from selfrec_tpu.ops import ranking, sampling
from selfrec_tpu.parallel import mesh as mesh_lib
from selfrec_tpu.utils import metrics
from selfrec_tpu.utils.logger import Log


class Recommender:
    """Base recommender: config parsing + run pipeline.

    Common hyperparameters mirror reference base/recommender.py:15-21.
    """

    def __init__(self, conf, training_set, test_set, **kwargs):
        self.config = conf
        self.model_name = conf["model"]["name"]
        self.ranking_topns = conf["item.ranking.topN"]
        self.emb_size = int(conf["embedding.size"])
        self.max_epoch = int(conf["max.epoch"])
        self.batch_size = int(conf["batch.size"])
        self.lrate = float(conf["learning.rate"])
        self.reg = float(conf["reg.lambda"])
        self.output = conf["output"]
        self.seed = int(conf.get("seed", 0))

        current_time = strftime("%Y-%m-%d %H-%M-%S", localtime(time()))
        self.model_log = Log(self.model_name, f"{self.model_name} {current_time}")
        self.result = []
        self.rec_output = []

    def initializing_log(self):
        self.model_log.add("### model configuration ###")
        for k, v in self.config.config.items():
            self.model_log.add(f"{k}={v}")

    def print_model_info(self):
        print("Model:", self.model_name)
        if self.config.contain("training.set"):
            print("Training Set:", abspath(self.config["training.set"]))
        if self.config.contain("test.set"):
            print("Test Set:", abspath(self.config["test.set"]))
        print("Embedding Dimension:", self.emb_size)
        print("Maximum Epoch:", self.max_epoch)
        print("Learning Rate:", self.lrate)
        print("Batch Size:", self.batch_size)
        print("Regularization Parameter:", self.reg)
        if self.config.contain(self.model_name):
            args = self.config[self.model_name]
            par_str = "  ".join(f"{k}:{v}" for k, v in args.items())
            print("Specific parameters:", par_str)

    # template methods ------------------------------------------------------
    def build(self):
        pass

    def train(self):
        pass

    def test(self):
        pass

    def save(self):
        pass

    def load(self):
        pass

    def evaluate(self, rec_list):
        pass

    def execute(self):
        self.initializing_log()
        self.print_model_info()
        print("Initializing and building model...")
        self.build()
        print("Training Model...")
        self.train()
        print("Testing...")
        rec_list = self.test()
        print("Evaluating...")
        self.evaluate(rec_list)
        return rec_list


class _FastEvalMixin:
    """Shared fast_evaluation: per-epoch eval at max_N, keep best by
    majority-of-metrics vote, save() on improvement (reference
    base/graph_recommender.py:81-104 == base/seq_recommender.py:60-83)."""

    def _fast_measure(self):
        """Per-epoch measure at max_N. Default: full rec-list + string-path
        metrics; GraphRecommender overrides with the id-array fast path."""
        rec_list = self.test()
        return metrics.ranking_evaluation(
            self.data.test_set, rec_list, [self.max_N])

    def fast_evaluation(self, epoch: int):
        print("Evaluating the model...")
        measure = self._fast_measure()
        performance = metrics.parse_measure(measure)

        if self.best_performance:
            count = sum(
                1 if self.best_performance[1][k] > performance[k] else -1
                for k in performance
            )
            if count < 0:
                self.best_performance = [epoch + 1, performance]
                self.save()
        else:
            self.best_performance = [epoch + 1, performance]
            self.save()

        print("-" * 80)
        print(f"Real-Time Ranking Performance (Top-{self.max_N} Item Recommendation)")
        measure_str = ", ".join(f"{k}: {v}" for k, v in performance.items())
        print(f"*Current Performance*\nEpoch: {epoch + 1}, {measure_str}")
        bp = ", ".join(f"{k}: {v}" for k, v in self.best_performance[1].items())
        print(f"*Best Performance*\nEpoch: {self.best_performance[0]}, {bp}")
        print("-" * 80)
        return measure


class GraphRecommender(_FastEvalMixin, Recommender):
    """Graph (user-item) recommender base with batched device evaluation."""

    eval_block_size = 1024

    def should_evaluate(self, epoch: int) -> bool:
        """fast_evaluation cadence. Reference default: EVERY epoch (e.g.
        SimGCL.py:40, DirectAU.py:34, BUIR.py:40); MF/LightGCN evaluate at
        epoch %% 5 == 0 and SGL from epoch >= 5 — those models override."""
        return True

    def __init__(self, conf, training_set, test_set, **kwargs):
        super().__init__(conf, training_set, test_set, **kwargs)
        self.data = Interaction(conf, training_set, test_set)
        self.best_performance: list = []
        self.topN = [int(n) for n in self.ranking_topns]
        self.max_N = max(self.topN)
        self.user_emb: Optional[np.ndarray] = None
        self.item_emb: Optional[np.ndarray] = None
        self.best_user_emb = None
        self.best_item_emb = None

    def print_model_info(self):
        super().print_model_info()
        tr = self.data.training_size()
        te = self.data.test_size()
        print(
            f"Training Set Size: (user number: {tr[0]}, item number: {tr[1]}, interaction number: {tr[2]})"
        )
        print(
            f"Test Set Size: (user number: {te[0]}, item number: {te[1]}, interaction number: {te[2]})"
        )
        print("=" * 80)

    # evaluation ------------------------------------------------------------
    def current_embeddings(self) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(user_emb, item_emb) to rank with right now; overridden state in
        train loops sets self.user_emb/item_emb."""
        return self.user_emb, self.item_emb

    def _sharded_topk_impl(self):
        """Per-shard top-k + merge when the item table is row-sharded over a
        >1 model axis (selfrec_tpu/parallel/topk.py); None otherwise."""
        mesh = getattr(self, "mesh", None)
        if mesh is None or mesh.shape.get(mesh_lib.MODEL_AXIS, 1) <= 1:
            return None
        n_items = self.data.item_num
        n_shards = mesh.shape[mesh_lib.MODEL_AXIS]
        if n_items % n_shards != 0 or self.max_N > n_items // n_shards:
            return None
        impl = getattr(self, "_sharded_topk_fn", None)
        if impl is None:
            from selfrec_tpu.parallel.topk import make_sharded_topk

            impl = self._sharded_topk_fn = make_sharded_topk(
                mesh, n_items, self.max_N
            )
        return impl

    def test(self) -> Dict[str, list]:
        user_emb, item_emb = self.current_embeddings()
        return ranking.rec_list_from_embeddings(
            self.data,
            user_emb,
            item_emb,
            self.max_N,
            block_size=self.eval_block_size,
            topk_impl=self._sharded_topk_impl(),
        )

    def _fast_measure(self):
        """Id-array eval: device top-k -> vectorized metrics over int ids,
        skipping the {user: [(name, score)]} assembly (~0.9s host at 30k
        test users). Exact-equal to the string path (tests/test_metrics.py).
        The sharded-top-k mesh path keeps the rec-list route, as do models
        without embedding tables (UserKNN/ItemKNN override test() with a
        score-function path and never set user_emb/item_emb)."""
        if self._sharded_topk_impl() is not None:
            return super()._fast_measure()
        user_emb, item_emb = self.current_embeddings()
        if user_emb is None or item_emb is None:
            return super()._fast_measure()
        top_ids = ranking.topk_ids_from_embeddings(
            self.data, user_emb, item_emb, self.max_N,
            block_size=self.eval_block_size)
        offsets, items = self.data.test_gt_csr()
        return metrics.ranking_evaluation_ids(
            offsets, items, top_ids, [self.max_N], self.data.item_num,
            sorted_test_keys=self.data.test_gt_sorted_keys())

    def evaluate(self, rec_list):
        self.rec_output.append(
            "userId: recommendations in (itemId, ranking score) pairs, * means the item is hit.\n"
        )
        for user in self.data.test_set:
            line = user + ":" + "".join(
                f" ({item[0]},{item[1]}){'*' if item[0] in self.data.test_set[user] else ''}"
                for item in rec_list[user]
            )
            self.rec_output.append(line + "\n")
        current_time = strftime("%Y-%m-%d %H-%M-%S", localtime(time()))
        out_dir = self.output
        file_name = f"{self.model_name}@{current_time}-top-{self.max_N}items.txt"
        io.write_file(out_dir, file_name, self.rec_output)
        print("The result has been output to ", abspath(out_dir), ".")
        file_name = f"{self.model_name}@{current_time}-performance.txt"
        self.result = metrics.ranking_evaluation(self.data.test_set, rec_list, self.topN)
        self.model_log.add("###Evaluation Results###")
        self.model_log.add(self.result)
        io.write_file(out_dir, file_name, self.result)
        print(f"The result of {self.model_name}:\n{''.join(self.result)}")

class JAXGraphRecommender(GraphRecommender):
    """Shared training machinery for embedding-table graph models.

    Subclasses implement:
      init_params(key) -> params pytree
      compute_embeddings(params, key=None) -> (user_emb, item_emb)
      batch_loss(params, batch, key) -> scalar loss
    and optionally override epoch hooks for per-epoch state (dropped graph
    views, k-means centroids, momentum targets...).

    Training runs the whole epoch as one lax.scan: host supplies the
    shuffled (users, items, mask) batch tensors once per epoch; negative
    sampling, forward, loss, backward and Adam all happen on device.
    """

    n_neg_rounds = 8
    n_negs = 1  # negatives per positive; MixGCF overrides (reference n_negs=64)
    log_batch_interval = 100

    def __init__(self, conf, training_set, test_set, **kwargs):
        super().__init__(conf, training_set, test_set, **kwargs)
        self.rng = np.random.default_rng(self.seed)
        self.key = jax.random.PRNGKey(self.seed)
        self.mesh = self._build_mesh()
        if conf.contain("compute.dtype"):
            from selfrec_tpu.ops.precision import set_compute_dtype

            set_compute_dtype(conf["compute.dtype"])
        self._rated_items = jnp.asarray(self.data.rated_items)
        self._rated_offsets = jnp.asarray(self.data.rated_offsets)
        max_deg = int(self.data.rated_counts().max()) if self.data.user_num else 1
        self._n_search_steps = max(1, int(np.ceil(np.log2(max_deg + 1))) + 1)
        self._rated_bitmap = None
        self.params = None
        self.opt_state = None
        self.optimizer = None
        self.aux: Dict[str, Any] = {}  # persistent per-step state (BUIR/SelfCF)
        self._epoch_fn = None

    # -- subclass contract ---------------------------------------------------
    def init_params(self, key) -> Any:
        raise NotImplementedError

    def compute_embeddings(self, params) -> Tuple[jnp.ndarray, jnp.ndarray]:
        raise NotImplementedError

    def batch_loss(self, params, batch: Dict[str, jnp.ndarray], key) -> jnp.ndarray:
        raise NotImplementedError

    def batch_loss_aux(self, params, batch: Dict[str, jnp.ndarray], key):
        """(loss, new_aux) — override when the model mutates per-step state
        INSIDE the loss computation (e.g. SelfCF's history-embedding buffers).
        new_aux must keep the structure of batch['aux']. Default: plain
        batch_loss, aux unchanged."""
        return self.batch_loss(params, batch, key), batch["aux"]

    # epoch hooks
    def epoch_setup(self, epoch: int) -> Dict[str, Any]:
        """Returns per-epoch auxiliary pytree passed to batch_loss via
        batch['aux'] (e.g. dropped adjacencies, cluster centroids)."""
        return {}

    def step_update(self, params, aux, batch: Dict[str, jnp.ndarray]):
        """Post-optimizer per-step aux update (runs inside the scanned step,
        AFTER apply_updates — e.g. BUIR's row-wise momentum target update,
        reference BUIR.py:36 calls update_target after optimizer.step()).
        Default: aux unchanged."""
        return aux

    def make_optimizer(self):
        return optax.adam(self.lrate)

    # -- mesh / sharding ------------------------------------------------------
    def _build_mesh(self):
        """Build the (data, model) device mesh if configured.

        Config section (absent in the reference — scale-out is new here):
        ``mesh: {data: D, model: M}``. Returns None (single-device path) when
        unconfigured or when the mesh would be 1x1.
        """
        if not self.config.contain("mesh"):
            return None
        m = self.config["mesh"] or {}
        n_data = int(m.get("data", 0)) or None
        n_model = int(m.get("model", 0)) or None
        built = mesh_lib.build_mesh(n_data, n_model)
        if built.devices.size <= 1:
            return None
        return built

    def make_adj(self, scipy_norm_adj=None):
        """Device adjacency for the unified bipartite Laplacian
        (``data.norm_adj`` by default): picks the dense-bipartite MXU path
        (ops/spmm_dense.py) on a single accelerator when it fits, else the
        ELL fast path, then places it on the mesh. Under a mesh the dense
        block is 2D-partitioned over the device grid
        (parallel/dense_shard.py — the per-device budget gate means the
        dense capacity GROWS with the device count); non-bipartite or
        over-budget graphs take the halo-exchange ELL kernel
        (parallel/halo.py)."""
        from selfrec_tpu.ops.graph import norm_adj_from_scipy

        mat = self.data.norm_adj if scipy_norm_adj is None else scipy_norm_adj
        if self.mesh is not None:
            sharded = self._try_sharded_dense(mat)
            if sharded is not None:
                return sharded
            return self.shard_adj(norm_adj_from_scipy(mat))
        return self.shard_adj(
            norm_adj_from_scipy(mat, n_users=self.data.user_num))

    def _try_sharded_dense(self, mat):
        """ShardedDenseAdj when the unified matrix is symmetric-bipartite,
        dense is enabled (env gate as on a single chip), and the per-device
        column slice fits the budget; None otherwise."""
        import os

        from selfrec_tpu.ops import spmm_dense
        from selfrec_tpu.parallel import dense_shard

        dense_mode = os.environ.get("SELFREC_TPU_DENSE", "auto")
        if dense_mode == "0" or (
                dense_mode != "1" and jax.default_backend() == "cpu"):
            return None
        n_users = self.data.user_num
        n_items = mat.shape[0] - n_users
        if (mat.shape[0] != mat.shape[1]
                or not dense_shard.fits_sharded_dense(
                    n_users, n_items, self.mesh)):
            return None
        blocks = spmm_dense.bipartite_blocks(mat.tocoo(), n_users)
        if blocks is None:
            return None
        eu, ei, w = blocks
        return dense_shard.build_sharded_dense(
            eu, ei, w, n_users, n_items, self.mesh)

    def shard_adj(self, adj):
        """Place an adjacency on the mesh. DenseAdj is rebuilt 2D-partitioned
        (parallel/dense_shard.py). With a model axis >1, EllAdj is rebuilt as
        a HaloAdj (parallel/halo.py): explicit halo-exchange shard_map SpMM
        over the row-sharded table — GSPMD's own resolution of the ELL gather
        all-reduces the nnz-sized gather output instead
        (scripts/audit_collectives.py). Otherwise (pure DP) arrays go over
        the data axis — sharded partial segment-sums; GSPMD adds the psum.
        No-op on a single device."""
        if self.mesh is None:
            return adj
        from selfrec_tpu.ops.spmm_dense import DenseAdj, DenseMat
        from selfrec_tpu.ops.spmm_ell import EllAdj

        if isinstance(adj, DenseAdj):
            from selfrec_tpu.parallel.dense_shard import sharded_dense_from_dense

            return sharded_dense_from_dense(adj, self.mesh)
        if isinstance(adj, DenseMat):
            # static square/rect matrix (MHCN/SEPT social engine): row-shard
            # the block over the WHOLE device grid and run the EXPLICIT
            # shard_map kernel (parallel/dense_shard.ShardedDenseMat) —
            # forward is the local-rows matmul, backward a psum of (N, D)
            # partials, so collectives stay operand-sized, never n x n
            # (GSPMD's own resolution all-gathers the block at small sizes)
            from selfrec_tpu.parallel.dense_shard import shard_dense_mat

            return shard_dense_mat(adj, self.mesh)
        if (isinstance(adj, EllAdj)
                and self.mesh.shape[mesh_lib.MODEL_AXIS] > 1):
            from selfrec_tpu.parallel.halo import halo_from_ell

            return halo_from_ell(adj, self.mesh)
        return jax.tree_util.tree_map(
            lambda a: mesh_lib.place_first_dim(a, self.mesh, mesh_lib.DATA_AXIS),
            adj,
        )

    # -- machinery ------------------------------------------------------------
    def build(self):
        self.key, init_key = jax.random.split(self.key)
        self.params = self.init_params(init_key)
        self.optimizer = self.make_optimizer()
        if self.mesh is not None:
            self.params = mesh_lib.shard_params(self.params, self.mesh)
            self.opt_state = jax.jit(self.optimizer.init)(self.params)
        else:
            self.opt_state = self.optimizer.init(self.params)
        # Wide-negative models (n_negs > 1, e.g. MixGCF's 64) switch the
        # in-scan rejection sampler's membership test from a per-lane CSR
        # binary search (~21 gathers/candidate) to a packed-bitmap probe
        # (1 gather/candidate) when the (U, ceil(I/32)) uint32 bitmap fits
        # the budget — measured sampling ~112 -> ~5 ms/batch at yelp scale
        # for MixGCF's 131k lanes (whole step 116 -> 37 ms), and ~1.8 ->
        # ~0.1 ms/batch for plain n_negs=1 BPR batches, where the binary
        # search was 60% of an MF step (round 4). Built here (not
        # __init__) because subclasses set n_negs after super().__init__.
        if self.data.user_num:
            import os

            words = (self.data.item_num + 31) // 32
            budget_mb = float(os.environ.get(
                "SELFREC_TPU_NEG_BITMAP_MB", "512"))
            if self.data.user_num * words * 4 <= budget_mb * 1e6:
                self._rated_bitmap = jnp.asarray(sampling.pack_rated_bitmap(
                    self.data.rated_offsets, self.data.rated_items,
                    self.data.user_num, self.data.item_num))
        self._compute_emb_jit = self._make_compute_emb_fn()

    def _make_compute_emb_fn(self):
        """Jitted compute_embeddings with the large device pytrees
        (adjacencies etc., ``scan_const_attrs``) threaded as ARGUMENTS, not
        closure constants. Baked-in constants ship inside the serialized HLO
        — a dense-bipartite adjacency (ops/spmm_dense.py) blew the axon
        remote-compile request body limit (HTTP 413), and even sparse
        layouts bloat the compile cache key."""

        def emb_fn(params, consts):
            saved = {n: getattr(self, n) for n in consts}
            try:
                for n, v in consts.items():
                    setattr(self, n, v)
                return self.compute_embeddings(params)
            finally:
                for n, v in saved.items():
                    setattr(self, n, v)

        jitted = jax.jit(emb_fn)
        return lambda params: jitted(params, self._scan_consts())

    def _make_epoch_fn(self):
        n_items = self.data.item_num
        n_search = self._n_search_steps
        optimizer = self.optimizer

        n_negs = self.n_negs

        def step(carry, batch):
            params, opt_state, key, aux = carry
            key, k_neg, k_loss = jax.random.split(key, 3)
            neg_shape = (
                batch["u"].shape if n_negs == 1 else (batch["u"].shape[0], n_negs)
            )
            if self._rated_bitmap is not None:
                neg = sampling.sample_negatives_bitmap(
                    k_neg,
                    batch["u"],
                    self._rated_bitmap,  # scan consts via the attribute swap
                    n_items,
                    shape=neg_shape,
                    n_rounds=self.n_neg_rounds,
                )
            else:
                neg = sampling.sample_negatives(
                    k_neg,
                    batch["u"],
                    self._rated_items,  # scan consts via the attribute swap
                    self._rated_offsets,
                    n_items,
                    shape=neg_shape,
                    n_rounds=self.n_neg_rounds,
                    n_search_steps=n_search,
                )
            full_batch = dict(batch, j=neg, aux=aux)
            (loss, aux), grads = jax.value_and_grad(
                self.batch_loss_aux, has_aux=True
            )(params, full_batch, k_loss)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            aux = self.step_update(params, aux, full_batch)
            return (params, opt_state, key, aux), loss

        def epoch_fn(params, opt_state, key, aux, users, items, masks, consts):
            # Large static pytrees (adjacencies) enter as ARGUMENTS, not jit
            # constants: 100MB+ constants inside a lax.scan body send XLA
            # into minutes of constant processing (measured 10x compile
            # blowup). During tracing the model attributes are swapped for
            # the traced views so batch_loss reads them transparently.
            saved = {n: getattr(self, n) for n in consts}
            for n, v in consts.items():
                setattr(self, n, v)
            try:
                (params, opt_state, key, aux), losses = jax.lax.scan(
                    step, (params, opt_state, key, aux),
                    {"u": users, "i": items, "mask": masks},
                )
            finally:
                for n, v in saved.items():
                    setattr(self, n, v)
            return params, opt_state, key, aux, losses

        return jax.jit(epoch_fn, donate_argnums=(0, 1))

    # attributes holding large static device pytrees used inside batch_loss;
    # threaded through the jitted epoch as scan-invariant arguments
    scan_const_attrs = (
        "adj", "social_adj", "sharing_adj", "H", "R", "Rt",
        "_rated_items", "_rated_offsets", "_rated_bitmap",
    )

    def _scan_consts(self):
        return {
            n: getattr(self, n)
            for n in self.scan_const_attrs
            if getattr(self, n, None) is not None
        }

    def epoch_rng(self, epoch: int, stream: int = 0) -> np.random.Generator:
        """Host RNG as a pure function of (seed, epoch, stream): epoch
        shuffles and per-epoch view draws are identical whether a run is
        continuous or resumed from a checkpoint, and across hosts."""
        return np.random.default_rng((self.seed, epoch, stream))

    def run_epoch(self, epoch: int) -> np.ndarray:
        import os

        if self._epoch_fn is None:
            self._epoch_fn = self._make_epoch_fn()
        if os.environ.get("SELFREC_TPU_HOST_BATCHES") == "1":
            # host A/B path: numpy shuffle + per-epoch H2D of the batches
            users, items, masks = sampling.epoch_pairwise_batches(
                self.epoch_rng(epoch),
                self.data.edge_users,
                self.data.edge_items,
                self.batch_size,
            )
            users, items, masks = (
                jnp.asarray(users), jnp.asarray(items), jnp.asarray(masks))
        else:
            # device path: edges stay resident, the shuffle runs on device
            # (zero per-epoch H2D); key is a pure function of (seed, epoch)
            # so resume matches continuous runs, same as epoch_rng
            if getattr(self, "_edges_dev", None) is None:
                self._edges_dev = (
                    jnp.asarray(self.data.edge_users),
                    jnp.asarray(self.data.edge_items),
                )
            shuffle_key = jax.random.fold_in(
                jax.random.PRNGKey(self.seed ^ 0x5E1F), epoch)
            users, items, masks = sampling.epoch_pairwise_batches_device(
                shuffle_key, *self._edges_dev, self.batch_size)
        aux = self.epoch_setup(epoch)
        if self.mesh is not None:
            sb = mesh_lib.scan_batch_sharding(self.mesh)
            users = jax.device_put(users, sb)
            items = jax.device_put(items, sb)
            masks = jax.device_put(masks, sb)
        self.params, self.opt_state, self.key, self.aux, losses = self._epoch_fn(
            self.params,
            self.opt_state,
            self.key,
            aux,
            users,
            items,
            masks,
            self._scan_consts(),
        )
        return np.asarray(losses)

    def _checkpoint_conf(self):
        ckpt_dir = self.config.get("checkpoint.dir")
        interval = int(self.config.get("checkpoint.interval", 5))
        return ckpt_dir, interval

    def _maybe_resume(self) -> int:
        from selfrec_tpu.utils import checkpoint as ckpt

        ckpt_dir, _ = self._checkpoint_conf()
        if not ckpt_dir:
            return 0
        step, state = ckpt.restore_checkpoint(ckpt_dir, ckpt.train_state(self))
        if step is None:
            return 0
        ckpt.apply_train_state(self, state)
        print(f"Resumed from checkpoint step {step} in {ckpt_dir}")
        return step

    def _maybe_checkpoint(self, epoch: int):
        from selfrec_tpu.utils import checkpoint as ckpt

        ckpt_dir, interval = self._checkpoint_conf()
        if ckpt_dir and (epoch + 1) % interval == 0:
            ckpt.save_checkpoint(ckpt_dir, epoch + 1, ckpt.train_state(self))

    def _profiler_hook(self, epoch: int, start_epoch: int):
        """jax.profiler trace of one steady-state epoch (SURVEY.md §5
        tracing row — absent in the reference). Config: ``profile.dir``;
        the second epoch of this process run is traced (the first includes
        compilation)."""
        profile_dir = self.config.get("profile.dir")
        if not profile_dir:
            return
        if epoch == start_epoch + 1:
            jax.profiler.start_trace(profile_dir)
            self._trace_active = True
        elif getattr(self, "_trace_active", False):
            self._stop_trace(profile_dir)

    def _stop_trace(self, profile_dir):
        jax.profiler.stop_trace()
        self._trace_active = False
        print(f"Profiler trace written to {profile_dir}")

    def train(self):
        start_epoch = self._maybe_resume()
        n_examples = self.data.n_edges
        for epoch in range(start_epoch, self.max_epoch):
            self._profiler_hook(epoch, start_epoch)
            t0 = time()
            losses = self.run_epoch(epoch)
            jax.block_until_ready(self.params)
            dt = time() - t0
            for n in range(0, len(losses), self.log_batch_interval):
                if n > 0:
                    print("training:", epoch + 1, "batch", n, "batch_loss:", float(losses[n]))
            print(
                f"epoch {epoch + 1}: {dt:.2f}s, {n_examples / max(dt, 1e-9):,.0f} examples/s"
            )
            self.user_emb, self.item_emb = self._compute_emb_jit(self.params)
            if self.should_evaluate(epoch):
                self.fast_evaluation(epoch)
            self._maybe_checkpoint(epoch)
        if getattr(self, "_trace_active", False):
            self._stop_trace(self.config.get("profile.dir"))
        if self.best_user_emb is not None:
            self.user_emb, self.item_emb = self.best_user_emb, self.best_item_emb

    def save(self):
        user_emb, item_emb = self._compute_emb_jit(self.params)
        self.best_user_emb = jax.device_get(user_emb)
        self.best_item_emb = jax.device_get(item_emb)


class SequentialRecommender(_FastEvalMixin, Recommender):
    """Sequential recommender base: padded-array data + batched device eval.

    Parity with reference base/seq_recommender.py:8-83: eval scores the LAST
    position of every training sequence against the full item table (no
    rated-item masking — SASRec.py:55-60), top-max_N, pad/oov ids filtered
    AFTER the top-k (seq_recommender.py:47-50), ``evaluate()`` is a no-op
    returning 0 (seq_recommender.py:57-58).
    """

    def __init__(self, conf, training_set, test_set, **kwargs):
        super().__init__(conf, training_set, test_set, **kwargs)
        self.data = Sequence(conf, training_set, test_set)
        self.max_len = int(conf["max.len"])
        self.best_performance: list = []
        self.topN = [int(n) for n in self.ranking_topns]
        self.max_N = max(self.topN)

    def print_model_info(self):
        super().print_model_info()
        print(
            f"Training Set Size: (sequence number: {self.data.raw_seq_num},"
            f" item number: {self.data.item_num})"
        )
        print("=" * 80)

    def predict_scores(self, params, seq, pos, seq_len):
        """(B, vocab) last-position scores; model-specific."""
        raise NotImplementedError

    def test(self) -> Dict[str, list]:
        seq, pos, seq_len = self.data.padded_test_arrays(self.max_len)
        n = seq.shape[0]
        bs = self.batch_size
        # ONE device dispatch for the whole catalog rank: a jitted
        # lax.scan over fixed-size blocks (per-block dispatches over the
        # tunnel dominated this path — 88 round-trips at amazon-beauty
        # scale; reference loops one user at a time,
        # base/seq_recommender.py:34-55)
        n_pad = (-n) % bs
        if n_pad:
            seq = np.concatenate(
                [seq, np.zeros((n_pad, seq.shape[1]), seq.dtype)])
            pos = np.concatenate(
                [pos, np.zeros((n_pad, pos.shape[1]), pos.dtype)])
            seq_len = np.concatenate([seq_len, np.ones(n_pad, seq_len.dtype)])
        blocks = (n + n_pad) // bs
        if getattr(self, "_test_scan_jit", None) is None:
            max_n = self.max_N

            def run(params, seqb, posb, slb):
                def body(_, xs):
                    s, p, sl = xs
                    sc, ids = ranking.topk_scores_unmasked(
                        self.predict_scores(params, s, p, sl), max_n
                    )
                    return None, (sc, ids)

                _, (sc, ids) = jax.lax.scan(body, None, (seqb, posb, slb))
                return sc.reshape(-1, max_n), ids.reshape(-1, max_n)

            self._test_scan_jit = jax.jit(run)
        scores_d, ids_d = self._test_scan_jit(
            self.params,
            jnp.asarray(seq.reshape(blocks, bs, -1)),
            jnp.asarray(pos.reshape(blocks, bs, -1)),
            jnp.asarray(seq_len.reshape(blocks, bs)),
        )
        ids = np.asarray(ids_d)[:n]
        scores = np.asarray(scores_d, dtype=np.float64)[:n]
        # pad/oov ids are filtered AFTER top-k, so lists may be short
        # (reference quirk, base/seq_recommender.py:47-50); bulk-translate
        # names then compress per row
        keep = (ids > 0) & (ids <= self.data.item_num)
        item_names = ranking._cached_names(
            self.data, "_item_names_arr", self.data.id2item,
            self.data.item_num + 1)
        name_rows = item_names[np.where(keep, ids, 0)].tolist()
        score_rows = scores.tolist()
        keep_rows = keep.tolist()
        rec_list: Dict[str, list] = {}
        for r in range(n):
            name = self.data.original_seq[r][0]
            kr = keep_rows[r]
            rec_list[name] = [
                (nm, sc)
                for nm, sc, kp in zip(name_rows[r], score_rows[r], kr)
                if kp
            ]
        return rec_list

    def evaluate(self, rec_list):
        return 0


class JAXSequentialRecommender(SequentialRecommender):
    """Scan-compiled training over padded sequence batches.

    Subclass contract:
      init_params(key) -> params
      batch_loss(params, batch, key) -> loss   with batch keys
        seq/pos/y/neg (B, max_len) and row_mask (B,)
      predict_scores(params, seq, pos, seq_len) -> (B, vocab)
    Negatives are sampled on device inside the scanned step
    (ops/seq_sampling.sample_seq_negatives).
    """

    def __init__(self, conf, training_set, test_set, **kwargs):
        super().__init__(conf, training_set, test_set, **kwargs)
        self.rng = np.random.default_rng(self.seed)
        self.key = jax.random.PRNGKey(self.seed)
        self.mesh = JAXGraphRecommender._build_mesh(self)
        self.params = None
        self.opt_state = None
        self.optimizer = None
        self._epoch_fn = None
        self._data_dev = None  # device-resident padded arrays (first epoch)
        self.best_params = None
        arrays = self.data.padded_training_arrays(self.max_len)
        self._seq_arr, self._pos_arr, self._y_arr, self._len_arr = arrays

    def init_params(self, key) -> Any:
        raise NotImplementedError

    def batch_loss(self, params, batch, key) -> jnp.ndarray:
        raise NotImplementedError

    def make_optimizer(self):
        return optax.adam(self.lrate)

    def build(self):
        self.key, init_key = jax.random.split(self.key)
        self.params = self.init_params(init_key)
        self.optimizer = self.make_optimizer()
        if self.mesh is not None:
            self.params = mesh_lib.shard_params(self.params, self.mesh)
            self.opt_state = jax.jit(self.optimizer.init)(self.params)
        else:
            self.opt_state = self.optimizer.init(self.params)
        self._predict_jit = jax.jit(self.predict_scores)

    def _make_epoch_fn(self):
        from selfrec_tpu.ops.seq_sampling import sample_seq_negatives

        optimizer = self.optimizer
        item_num = self.data.item_num

        def step(carry, batch):
            params, opt_state, key = carry
            key, k_neg, k_loss = jax.random.split(key, 3)
            neg = sample_seq_negatives(k_neg, batch["seq"], item_num)
            full = dict(batch, neg=neg)
            loss, grads = jax.value_and_grad(self.batch_loss)(params, full, k_loss)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), loss

        mesh = self.mesh

        def epoch_fn(params, opt_state, key, seq_all, pos_all, y_all,
                     len_all, idx, row_masks):
            # The epoch's shuffled batches are gathered ON DEVICE from the
            # resident padded arrays — the host ships only the permutation
            # (4 bytes/sequence), not the gathered (n, max_len) batch
            # tensors (~13 MB/epoch at amazon-beauty scale through the
            # tunnel). The permutation itself stays host-side epoch_rng
            # (checkpoint-resume contract), so batch contents are identical.
            n_batches, bs = row_masks.shape

            def take(a):
                out = a[idx].reshape(n_batches, bs, *a.shape[1:])
                if mesh is not None and bs % mesh.shape[mesh_lib.DATA_AXIS] == 0:
                    from jax.sharding import PartitionSpec as P

                    spec = P(None, mesh_lib.DATA_AXIS,
                             *([None] * (out.ndim - 2)))
                    out = jax.lax.with_sharding_constraint(
                        out, jax.sharding.NamedSharding(mesh, spec))
                return out

            (params, opt_state, key), losses_out = jax.lax.scan(
                step,
                (params, opt_state, key),
                {
                    "seq": take(seq_all),
                    "pos": take(pos_all),
                    "y": take(y_all),
                    "seq_len": take(len_all),
                    "row_mask": row_masks,
                },
            )
            return params, opt_state, key, losses_out

        return jax.jit(epoch_fn, donate_argnums=(0, 1))

    epoch_rng = JAXGraphRecommender.epoch_rng

    def run_epoch(self, epoch: int) -> np.ndarray:
        if self._epoch_fn is None:
            self._epoch_fn = self._make_epoch_fn()
        n = self._seq_arr.shape[0]
        perm = self.epoch_rng(epoch).permutation(n)
        bs = self.batch_size
        n_batches = -(-n // bs)
        pad = n_batches * bs - n
        idx = np.concatenate([perm, np.zeros(pad, dtype=perm.dtype)])
        row_mask = np.concatenate(
            [np.ones(n, np.float32), np.zeros(pad, np.float32)]
        )
        if getattr(self, "_data_dev", None) is None:
            # one-time upload; epochs thereafter ship only idx + row_mask
            self._data_dev = tuple(
                jnp.asarray(a)
                for a in (self._seq_arr, self._pos_arr, self._y_arr,
                          self._len_arr)
            )

        self.params, self.opt_state, self.key, losses_out = self._epoch_fn(
            self.params,
            self.opt_state,
            self.key,
            *self._data_dev,
            jnp.asarray(idx.astype(np.int32)),
            jnp.asarray(row_mask.reshape(n_batches, bs)),
        )
        return np.asarray(losses_out)

    _checkpoint_conf = JAXGraphRecommender._checkpoint_conf
    _maybe_resume = JAXGraphRecommender._maybe_resume
    _maybe_checkpoint = JAXGraphRecommender._maybe_checkpoint

    def train(self):
        start_epoch = self._maybe_resume()
        for epoch in range(start_epoch, self.max_epoch):
            losses_arr = self.run_epoch(epoch)
            for b in range(0, len(losses_arr), 50):
                print(
                    "training:", epoch + 1, "batch", b,
                    "rec_loss:", float(losses_arr[b]),
                )
            self.fast_evaluation(epoch)
            self._maybe_checkpoint(epoch)
        if self.best_params is not None:
            self.params = self.best_params

    def save(self):
        self.best_params = jax.device_get(self.params)
