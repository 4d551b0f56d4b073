"""Link classification task.

Rebuild of ``SSRG/tasks/link_classification.py:13-123`` + the link train/eval
steps (``tasks/utils.py:30-103``; SURVEY.md §2.7): the adjacency is rebuilt
from the observed edges, node features are precomputed exactly as in node
classification, and the head scores concatenated endpoint representations of
``query_edges`` pairs. Best-val→test protocol with multi-run mean±std.

Minibatching note: the reference remaps global→local node ids per edge batch
through Python dicts (``tasks/utils.py:46-51``); here the precomputed feature
matrix stays device-resident, so a batch is just an index slice of query
pairs — no remapping, one compiled step.
"""

from __future__ import annotations

from typing import Optional, Tuple

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ssrg_tpu.configs.config import ModelConfig, TrainingConfig
from ssrg_tpu.models.zoo import ModelSpec
from ssrg_tpu.train.common import (
    accuracy,
    batch_iterator,
    create_train_state,
    cross_entropy_loss,
    seed_everything,
)
from ssrg_tpu.train.node_classification import Prepared, prepare


class LinkClassification:
    def __init__(
        self,
        dataset,
        spec: ModelSpec,
        model_cfg: ModelConfig,
        training_cfg: TrainingConfig,
        verbose: bool = False,
        run: bool = True,
    ):
        self.dataset = dataset
        self.spec = spec
        self.model_cfg = model_cfg
        self.cfg = training_cfg
        self.verbose = verbose
        self.record = {"val_acc": [], "test_acc": []}

        # rebuild adjacency from observed edges (reference
        # link_classification.py:22)
        dataset.adj = sp.csr_matrix(
            (
                dataset.observed_edge_weight,
                (dataset.observed_edge_idx[0], dataset.observed_edge_idx[1]),
            ),
            shape=(dataset.num_node, dataset.num_node),
        )

        self.pairs = {
            "train": (
                jnp.asarray(dataset.train_edge_pairs_idx),
                jnp.asarray(dataset.train_edge_pairs_label),
            ),
            "val": (
                jnp.asarray(dataset.val_edge_pairs_idx),
                jnp.asarray(dataset.val_edge_pairs_label),
            ),
            "test": (
                jnp.asarray(dataset.test_edge_pairs_idx),
                jnp.asarray(dataset.test_edge_pairs_label),
            ),
        }

        self.prepared = prepare(spec, dataset, model_cfg, training_cfg)
        if run:
            for i in range(training_cfg.normalize_times):
                self.execute(seed=training_cfg.seed + i)

    @property
    def best_val(self) -> float:
        return float(np.mean(self.record["val_acc"]))

    @property
    def best_test(self) -> float:
        return float(np.mean(self.record["test_acc"]))

    def get_test_acc(self) -> float:
        return self.best_test

    def execute(self, seed: int = 2023) -> Tuple[float, float]:
        p = self.prepared
        cfg = self.cfg
        rng = seed_everything(seed)
        np_rng = np.random.default_rng(seed)
        module = p.module

        init_kwargs = {"adj": p.adj_device} if p.adj_device is not None else {}
        tr_pairs, tr_labels = self.pairs["train"]
        rng, init_rng = jax.random.split(rng)
        state = create_train_state(
            module, init_rng, p.inputs, cfg.lr, cfg.weight_decay,
            warmup_epochs=cfg.warmup_epochs,
            query_edges=tr_pairs[:2], **init_kwargs,
        )

        # inputs + adjacency ride through jit as ARGUMENTS (partial-bound),
        # not closure captures — captured device arrays become HLO constants
        # (slow compiles; HTTP 413 on remote-compile relays at scale)
        @jax.jit
        def train_step(inputs, adj, state, pairs, labels, weights, rng):
            kw = {"adj": adj} if adj is not None else {}

            def loss_fn(params):
                logits = module.apply(
                    {"params": params}, inputs, train=True,
                    query_edges=pairs, rngs={"dropout": rng}, **kw,
                )
                return cross_entropy_loss(logits, labels, weights), logits

            (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            return state.apply_gradients(grads=grads), loss, accuracy(logits, labels)

        @jax.jit
        def eval_step(inputs, adj, state, pairs, labels):
            kw = {"adj": adj} if adj is not None else {}
            logits = module.apply(
                {"params": state.params}, inputs, train=False,
                query_edges=pairs, **kw,
            )
            return accuracy(logits, labels)

        train_step_raw, eval_step_raw = train_step, eval_step
        train_step = partial(train_step, p.inputs, p.adj_device)
        eval_step = partial(eval_step, p.inputs, p.adj_device)

        best_val = best_test = 0.0
        minibatch = cfg.train_batch_size is not None

        if getattr(cfg, "scan_epochs", False) and not minibatch:
            # whole run in one jitted lax.scan (same shape as the node task's
            # epoch-scan trainer; see node_classification._execute_scanned)
            va_pairs, va_labels = self.pairs["val"]
            te_pairs, te_labels = self.pairs["test"]

            if getattr(self, "_scan_runner", None) is None:

                @partial(jax.jit, static_argnames=("epochs",))
                def run(inputs, adj, state, trp, trl, vap, val_l, tep, tel,
                        rng0, epochs):
                    def epoch(carry, i):
                        state, best_val, best_test = carry
                        step_rng = jax.random.fold_in(rng0, i)
                        state, loss, _ = train_step_raw(
                            inputs, adj, state, trp, trl, None, step_rng
                        )
                        acc_val = eval_step_raw(inputs, adj, state, vap, val_l)
                        acc_test = eval_step_raw(inputs, adj, state, tep, tel)
                        better = acc_val > best_val
                        best_val = jnp.where(better, acc_val, best_val)
                        best_test = jnp.where(better, acc_test, best_test)
                        return (state, best_val, best_test), loss

                    init = (state, jnp.float32(0.0), jnp.float32(0.0))
                    return jax.lax.scan(
                        epoch, init, jnp.arange(epochs), length=epochs
                    )

                self._scan_runner = run

            (state, bv, bt), losses = self._scan_runner(
                p.inputs, p.adj_device, state, tr_pairs, tr_labels,
                va_pairs, va_labels, te_pairs, te_labels, rng,
                cfg.num_epochs,
            )
            best_val, best_test = float(bv), float(bt)
            if self.verbose:
                for epoch, loss in enumerate(np.asarray(losses)):
                    print(f"Epoch {epoch + 1:03d} loss {float(loss):.4f}")
            self.record["val_acc"].append(best_val)
            self.record["test_acc"].append(best_test)
            self.state = state
            return best_val, best_test

        for epoch in range(cfg.num_epochs):
            if minibatch:
                order = np.arange(int(tr_pairs.shape[0]))
                for batch, w in batch_iterator(order, cfg.train_batch_size, np_rng):
                    rng, step_rng = jax.random.split(rng)
                    state, loss, _ = train_step(
                        state, tr_pairs[batch], tr_labels[batch],
                        jnp.asarray(w), step_rng,
                    )
            else:
                rng, step_rng = jax.random.split(rng)
                state, loss, _ = train_step(
                    state, tr_pairs, tr_labels, None, step_rng
                )
            acc_val = float(eval_step(state, *self.pairs["val"]))
            acc_test = float(eval_step(state, *self.pairs["test"]))
            if self.verbose:
                print(
                    f"Epoch {epoch + 1:03d} loss {float(loss):.4f} "
                    f"val {acc_val:.4f} test {acc_test:.4f}"
                )
            if acc_val > best_val:
                best_val, best_test = acc_val, acc_test

        self.record["val_acc"].append(best_val)
        self.record["test_acc"].append(best_test)
        self.state = state
        return best_val, best_test
