"""Baseline pipeline trainer.

Rebuild of the reference's top-level ``main.py`` flow (SURVEY.md §2.11):
choose model (MLP/robustMLP/GCN/SAGE/GAT/SGC/SIGN), run R times, each run
full-batch epochs with best-val selection via :class:`RunLogger`; optional
cluster-partition minibatch training (the reference's PyG
ClusterData(num_parts=128)/ClusterLoader(batch=32) path, ``main.py:28-44``).

Cluster partitioning here is BFS-ordered contiguous chunking (no METIS
dependency): nodes are reordered by BFS for locality, split into
``num_parts`` chunks, and each step trains on a batch of parts with the
induced subgraph — all batches prebuilt once with padded static shapes so
the whole epoch reuses compiled steps. The reference quirk of stepping the
optimizer once per full loader pass (``main.py:41-43``) is NOT copied: each
cluster batch takes a proper optimizer step.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ssrg_tpu.configs.config import TrainingConfig
from ssrg_tpu.logger import RunLogger
from ssrg_tpu.models.baselines import (
    BaselineGAT,
    BaselineGCN,
    BaselineMLP,
    BaselineSAGE,
    BaselineSGC,
    BaselineSIGN,
    EdgeList,
    RobustMLP,
    triplet_loss,
)
from ssrg_tpu.ops.normalize import sym_norm
from ssrg_tpu.ops.propagate import propagate
from ssrg_tpu.ops.sparse import _round_up, device_adjacency
from ssrg_tpu.train.common import (
    accuracy,
    create_train_state,
    cross_entropy_loss,
    seed_everything,
)


def mean_norm(adj: sp.spmatrix) -> sp.csr_matrix:
    """Row-mean normalization P = D^{-1}A for SAGE."""
    csr = adj.tocsr().astype(np.float64)
    deg = np.asarray(csr.sum(axis=1)).reshape(-1)
    with np.errstate(divide="ignore"):
        inv = 1.0 / deg
    inv[~np.isfinite(inv)] = 0.0
    return (sp.diags(inv) @ csr).tocsr().astype(np.float32)


def bfs_order(adj: sp.csr_matrix) -> np.ndarray:
    """BFS node ordering for partition locality (METIS-free)."""
    from scipy.sparse.csgraph import breadth_first_order

    n = adj.shape[0]
    seen = np.zeros(n, bool)
    order = []
    for start in range(n):
        if seen[start]:
            continue
        nodes = breadth_first_order(adj, start, return_predecessors=False)
        nodes = nodes[~seen[nodes]]
        seen[nodes] = True
        order.append(nodes)
    return np.concatenate(order) if order else np.arange(n)


@dataclass
class ClusterBatch:
    node_ids: jnp.ndarray    # [B_pad] global ids (padded by repeat)
    valid: jnp.ndarray       # f32 [B_pad]
    adj_dev: object          # induced sub-adjacency on device


def build_cluster_batches(
    adj: sp.csr_matrix, num_parts: int, parts_per_batch: int,
    engine: str = "auto", seed: int = 0, model_kind: str = "gcn",
) -> List[ClusterBatch]:
    """Prebuild cluster minibatches with the induced-subgraph operator the
    chosen model consumes (reference runs ClusterLoader for whichever model
    was picked, ``/root/reference/main.py:28-44``): ``gcn`` → symmetric-norm
    sub-adjacency, ``sage`` → row-mean-norm sub-adjacency, ``gat`` →
    induced-subgraph :class:`EdgeList` (all batches padded to ONE static
    edge count so a single compiled step serves the whole epoch)."""
    n = adj.shape[0]
    order = bfs_order(adj)
    parts = np.array_split(order, num_parts)
    rng = np.random.default_rng(seed)
    part_order = rng.permutation(num_parts)
    groups = [
        np.concatenate([parts[i] for i in part_order[b : b + parts_per_batch]])
        for b in range(0, num_parts, parts_per_batch)
    ]
    b_pad = max(g.shape[0] for g in groups)
    staged = []
    for g in groups:
        pad = b_pad - g.shape[0]
        ids = np.concatenate([g, np.repeat(g[:1], pad)]) if pad else g
        valid = np.concatenate([np.ones(g.shape[0], np.float32),
                                np.zeros(pad, np.float32)])
        staged.append((ids, valid, adj[ids][:, ids]))

    batches = []
    if model_kind == "gat":
        e_pad = max(512, _round_up(max(s.nnz for _, _, s in staged), 512))
        for ids, valid, sub in staged:
            batches.append(ClusterBatch(
                jnp.asarray(ids), jnp.asarray(valid),
                EdgeList.from_scipy(sub, e_pad=e_pad),
            ))
        return batches
    norm = mean_norm if model_kind == "sage" else (
        lambda a: sym_norm(a, 0.5)
    )
    for ids, valid, sub in staged:
        batches.append(ClusterBatch(
            jnp.asarray(ids), jnp.asarray(valid),
            device_adjacency(norm(sub), engine),
        ))
    return batches


class BaselineTask:
    """Multi-run baseline trainer (reference main.py:110-137)."""

    MODELS = ("mlp", "robust_mlp", "gcn", "sage", "gat", "sgc", "sign")

    def __init__(
        self,
        dataset,
        model_name: str,
        cfg: TrainingConfig,
        hidden_dim: int = 64,
        num_layers: int = 2,
        dropout: float = 0.5,
        runs: int = 1,
        prop_steps: int = 3,
        cluster_parts: Optional[int] = None,
        parts_per_batch: int = 8,
        triplet_weight: float = 0.0,
        verbose: bool = False,
        run: bool = True,
    ):
        if model_name not in self.MODELS:
            raise ValueError(
                f"unknown baseline {model_name!r}; available: {self.MODELS}"
            )
        self.dataset = dataset
        self.model_name = model_name
        self.cfg = cfg
        self.runs = runs
        self.verbose = verbose
        self.triplet_weight = triplet_weight
        self.logger = RunLogger(runs)
        self.num_classes = dataset.num_classes

        engine = cfg.spmm_engine
        x = jnp.asarray(dataset.x, jnp.float32)
        self.labels = jnp.asarray(dataset.y)
        self.idx = {
            "train": jnp.asarray(np.asarray(dataset.train_idx)),
            "val": jnp.asarray(np.asarray(dataset.val_idx)),
            "test": jnp.asarray(np.asarray(dataset.test_idx)),
        }

        gcn_like = model_name in ("gcn", "sage", "gat")
        self.cluster_batches = None
        if model_name == "gcn":
            self.adj_op = device_adjacency(sym_norm(dataset.adj, 0.5), engine)
            self.module = BaselineGCN(hidden_dim, self.num_classes, num_layers, dropout)
            self.inputs = x
        elif model_name == "sage":
            self.adj_op = device_adjacency(mean_norm(dataset.adj), engine)
            self.module = BaselineSAGE(hidden_dim, self.num_classes, num_layers, dropout)
            self.inputs = x
        elif model_name == "gat":
            self.adj_op = EdgeList.from_scipy(dataset.adj)
            self.module = BaselineGAT(
                hidden_dim, self.num_classes, num_layers, dropout=dropout
            )
            self.inputs = x
        elif model_name == "sgc":
            p = device_adjacency(sym_norm(dataset.adj, 0.5), engine)
            self.inputs = propagate(p, x, prop_steps)[-1]
            self.adj_op = None
            self.module = BaselineSGC(self.num_classes)
        elif model_name == "sign":
            p = device_adjacency(sym_norm(dataset.adj, 0.5), engine)
            self.inputs = propagate(p, x, prop_steps)
            self.adj_op = None
            self.module = BaselineSIGN(hidden_dim, self.num_classes, dropout)
        elif model_name == "mlp":
            self.adj_op = None
            self.module = BaselineMLP(hidden_dim, self.num_classes, num_layers, dropout)
            self.inputs = x
        else:  # robust_mlp
            self.adj_op = None
            self.module = RobustMLP(hidden_dim, self.num_classes, num_layers, dropout)
            self.inputs = x

        if cluster_parts is not None:
            if not gcn_like:
                raise ValueError(
                    "cluster minibatching applies to the full-graph models "
                    f"(gcn/sage/gat), not {model_name!r} — precompute-family "
                    "baselines minibatch over nodes instead"
                )
            self.cluster_batches = build_cluster_batches(
                dataset.adj, cluster_parts, parts_per_batch, engine,
                cfg.seed, model_kind=model_name,
            )

        if run:
            for r in range(runs):
                self.execute(r, seed=cfg.seed + r)

    # ------------------------------------------------------------------

    def _apply(self, params, batch_stats, inputs, adj, train, rng, module=None):
        module = module or self.module
        variables = {"params": params}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        kwargs = {"train": train}
        args = (inputs,) if adj is None else (inputs, adj)
        out = module.apply(
            variables, *args,
            rngs={"dropout": rng} if train else None,
            mutable=["batch_stats"] if (train and batch_stats is not None) else False,
            **kwargs,
        )
        if train and batch_stats is not None:
            y, newv = out
            return y, newv["batch_stats"]
        return out, batch_stats

    def execute(self, run_id: int, seed: int) -> None:
        cfg = self.cfg
        rng = seed_everything(seed)
        rng, init_rng = jax.random.split(rng)
        robust = self.model_name == "robust_mlp"

        state = self._init_state(init_rng)

        # inputs/adjacency/labels/idx ride through jit as ARGUMENTS
        # (partial-bound), not closure captures — captured device arrays
        # become HLO constants (slow compiles; remote-compile size limits)
        @jax.jit
        def train_step(inputs, adj_op, labels, idx, state, rng):
            def loss_fn(params):
                out, new_bs = self._apply(
                    params, state.batch_stats, inputs, adj_op, True, rng
                )
                tr = idx["train"]
                if robust:
                    hidden, logp = out
                    loss = -jnp.mean(
                        jnp.take_along_axis(
                            logp[tr], labels[tr][:, None], axis=1
                        )
                    )
                    if self.triplet_weight:
                        loss = loss + self.triplet_weight * triplet_loss(
                            hidden, labels, tr, self.num_classes
                        )
                    logits = logp
                else:
                    logits = out
                    loss = cross_entropy_loss(logits[tr], labels[tr])
                return loss, (logits, new_bs)

            (loss, (logits, new_bs)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(state.params)
            state = state.apply_gradients(grads=grads)
            if new_bs is not None:
                state = state.replace(batch_stats=new_bs)
            return state, loss

        @jax.jit
        def eval_step(inputs, adj_op, labels, idx, state):
            out, _ = self._apply(
                state.params, state.batch_stats, inputs, adj_op, False, None,
            )
            logits = out[1] if robust else out
            return tuple(
                accuracy(logits[idx[k]], labels[idx[k]])
                for k in ("train", "val", "test")
            )

        train_step = partial(
            train_step, self.inputs, self.adj_op, self.labels, self.idx
        )
        eval_step = partial(
            eval_step, self.inputs, self.adj_op, self.labels, self.idx
        )

        cluster_step = None
        if self.cluster_batches is not None:
            train_mask = np.zeros(self.dataset.num_node, np.float32)
            train_mask[np.asarray(self.dataset.train_idx)] = 1.0
            train_mask_dev = jnp.asarray(train_mask)

            # full-graph inputs/labels/mask ride through jit as ARGUMENTS
            # (partial-bound) like train_step above — closure capture would
            # inline them as HLO constants (Reddit-scale compile bloat /
            # remote-compile 413s)
            @jax.jit
            def cluster_step(inputs, labels, train_mask, state, node_ids,
                             valid, adj_dev, rng):
                def loss_fn(params):
                    out, new_bs = self._apply(
                        params, state.batch_stats, inputs[node_ids],
                        adj_dev, True, rng,
                    )
                    w = valid * train_mask[node_ids]
                    loss = cross_entropy_loss(out, labels[node_ids], w)
                    return loss, new_bs

                (loss, new_bs), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(state.params)
                state = state.apply_gradients(grads=grads)
                if new_bs is not None:
                    state = state.replace(batch_stats=new_bs)
                return state, loss

            self._cluster_step_impl = cluster_step  # regression hook (tests)
            cluster_step = partial(
                cluster_step, self.inputs, self.labels, train_mask_dev
            )

        for epoch in range(cfg.num_epochs):
            rng, step_rng = jax.random.split(rng)
            if cluster_step is not None:
                for cb in self.cluster_batches:
                    rng, step_rng = jax.random.split(rng)
                    state, loss = cluster_step(
                        state, cb.node_ids, cb.valid, cb.adj_dev, step_rng
                    )
            else:
                state, loss = train_step(state, step_rng)
            tr, va, te = (float(a) for a in eval_step(state))
            self.logger.add_result(run_id, (tr, va, te))
            if self.verbose:
                print(f"run {run_id} epoch {epoch+1}: loss {float(loss):.4f} "
                      f"train {tr:.4f} val {va:.4f} test {te:.4f}")
        self.state = state

    def _init_state(self, rng):
        from ssrg_tpu.train.common import TrainState, make_optimizer

        kwargs = {"train": False}
        args = (self.inputs,) if self.adj_op is None else (self.inputs, self.adj_op)
        variables = self.module.init({"params": rng, "dropout": rng}, *args, **kwargs)
        return TrainState.create(
            apply_fn=self.module.apply,
            params=variables["params"],
            tx=make_optimizer(self.cfg.lr, self.cfg.weight_decay),
            batch_stats=variables.get("batch_stats"),
        )

    # ------------------------------------------------------------------

    def best_of_run(self, run_id: int):
        return self.logger.best_of_run(run_id)

    @property
    def best_test(self) -> float:
        pairs = [self.logger.best_of_run(r) for r in range(self.runs)]
        return float(np.mean([p[1] for p in pairs]))
