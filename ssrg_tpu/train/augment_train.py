"""Augmentation-encoder trainer (TrainModel).

Rebuild of ``SSRG/tasks/model_train.py:11-102`` (SURVEY.md §2.7): trains a
head returning ``(mid_dim, logits)`` tuples (CleanTrainModel /
FeatureAugment2MLP) over raw features with the usual CE objective; exposes
``get_mid_dim`` and the best-val protocol.
"""

from __future__ import annotations

from typing import Tuple

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ssrg_tpu.configs.config import ModelConfig, TrainingConfig
from ssrg_tpu.models.zoo import ModelSpec
from ssrg_tpu.train.common import (
    accuracy,
    create_train_state,
    cross_entropy_loss,
    seed_everything,
)


class TrainModel:
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
        self.cfg = training_cfg
        self.verbose = verbose
        self.module = spec.module
        self.x = jnp.asarray(dataset.x, jnp.float32)
        self.y = jnp.asarray(dataset.y)
        self.train_idx = jnp.asarray(np.asarray(dataset.train_idx))
        self.val_idx = jnp.asarray(np.asarray(dataset.val_idx))
        self.test_idx = jnp.asarray(np.asarray(dataset.test_idx))
        self.best_val = self.best_test = 0.0
        if run:
            self.execute(training_cfg.seed)

    def execute(self, seed: int = 2023) -> Tuple[float, float]:
        cfg = self.cfg
        module = self.module
        rng = seed_everything(seed)
        rng, init_rng = jax.random.split(rng)
        state = create_train_state(
            module, init_rng, self.x[:2], cfg.lr, cfg.weight_decay
        )

        # features/labels ride through jit as ARGUMENTS (partial-bound), not
        # closure captures — captured device arrays become HLO constants
        @jax.jit
        def train_step(x, y, train_idx, state, rng):
            def loss_fn(params):
                _, logits = module.apply(
                    {"params": params}, x, train=True,
                    rngs={"dropout": rng},
                )
                return cross_entropy_loss(
                    logits[train_idx], y[train_idx]
                ), logits

            (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            return state.apply_gradients(grads=grads), loss

        @jax.jit
        def eval_step(x, y, val_idx, test_idx, state):
            mid, logits = module.apply(
                {"params": state.params}, x, train=False
            )
            return (
                accuracy(logits[val_idx], y[val_idx]),
                accuracy(logits[test_idx], y[test_idx]),
                mid,
                logits,
            )

        train_step = partial(train_step, self.x, self.y, self.train_idx)
        eval_step = partial(
            eval_step, self.x, self.y, self.val_idx, self.test_idx
        )

        best_val = best_test = 0.0
        for epoch in range(cfg.num_epochs):
            rng, step_rng = jax.random.split(rng)
            state, loss = train_step(state, step_rng)
            acc_val, acc_test, _, _ = eval_step(state)
            acc_val, acc_test = float(acc_val), float(acc_test)
            if acc_val > best_val:
                best_val, best_test = acc_val, acc_test
                self.best_state = state
        self.state = state
        self.best_val, self.best_test = best_val, best_test
        return best_val, best_test

    def get_mid_dim(self):
        """(reference model_train.py:99-102): hidden representation + logits
        of the best snapshot."""
        mid, logits = self.module.apply(
            {"params": self.best_state.params}, self.x, train=False
        )
        return np.asarray(mid), np.asarray(logits)
