"""Shared training utilities: metrics, seeding, optimizer, train state.

Replaces the reference's ``SSRG/tasks/utils.py`` train/eval helpers and
``SSRG/utils.py`` seeding with jitted JAX equivalents (SURVEY.md §2.7/§2.10).
"""

from __future__ import annotations

import random
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.training import train_state


def seed_everything(seed: int) -> jax.Array:
    """Seed python/numpy and return a JAX PRNG key
    (reference: SSRG/utils.py:10-18 seed_everything)."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


def accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """argmax accuracy (reference: tasks/utils.py:14-18)."""
    return jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))


def cross_entropy_loss(logits: jnp.ndarray, labels: jnp.ndarray,
                       weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    losses = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    if weights is None:
        return losses.mean()
    denom = jnp.maximum(weights.sum(), 1.0)
    return (losses * weights).sum() / denom


def make_optimizer(
    lr: float, weight_decay: float, warmup_epochs: int = 0
) -> optax.GradientTransformation:
    """Adam with decoupled-from-schedule L2 added to the gradient before the
    moment updates — the semantics of ``torch.optim.Adam(weight_decay=wd)``
    used by the reference (``tasks/node_classification.py:26-27``).
    ``warmup_epochs`` linearly ramps the lr over the first N steps
    (the reference's ``adjust_learning_rate``, tasks/utils.py:20-23)."""
    if warmup_epochs:
        schedule = optax.linear_schedule(0.0, lr, warmup_epochs)
    else:
        schedule = lr
    opt = optax.adam(schedule)
    if weight_decay:
        return optax.chain(optax.add_decayed_weights(weight_decay), opt)
    return opt


def split_labels(
    labels: np.ndarray,
    train_per_class: int = 20,
    num_val: int = 500,
    num_test: int = 1000,
    seed: int = 0,
):
    """Random class-balanced split (reference top-level utils.py:38-48
    splitLabels): ``train_per_class`` per class, then ``num_val``/``num_test``
    from the remainder."""
    rng = np.random.default_rng(seed)
    labels = np.asarray(labels)
    train = []
    for k in np.unique(labels):
        idx_k = np.where(labels == k)[0]
        train.extend(rng.permutation(idx_k)[:train_per_class])
    train = np.sort(np.asarray(train))
    rest = rng.permutation(np.setdiff1d(np.arange(labels.shape[0]), train))
    val = np.sort(rest[:num_val])
    test = np.sort(rest[num_val : num_val + num_test])
    return train, val, test


def add_labels(features: np.ndarray, labels: np.ndarray, idx: np.ndarray,
               num_classes: int) -> np.ndarray:
    """Concat one-hot labels of ``idx`` rows onto the features
    (label-as-feature trick; reference tasks/utils.py:25-28)."""
    onehot = np.zeros((features.shape[0], num_classes), features.dtype)
    onehot[idx, labels[idx]] = 1
    return np.concatenate([features, onehot], axis=-1)


class TrainState(train_state.TrainState):
    """TrainState carrying optional BatchNorm statistics."""

    batch_stats: Optional[Dict[str, Any]] = None


def create_train_state(
    module,
    rng: jax.Array,
    example_inputs,
    lr: float,
    weight_decay: float,
    warmup_epochs: int = 0,
    **apply_kwargs,
) -> TrainState:
    variables = module.init(
        {"params": rng, "dropout": rng}, example_inputs, train=False, **apply_kwargs
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats")
    return TrainState.create(
        apply_fn=module.apply,
        params=params,
        tx=make_optimizer(lr, weight_decay, warmup_epochs=warmup_epochs),
        batch_stats=batch_stats,
    )


def batch_iterator(idx: np.ndarray, batch_size: int, rng: np.random.Generator,
                   shuffle: bool = True):
    """Static-shape minibatch index iterator: shuffles, pads the last batch by
    wrapping, and yields (batch_idx [B], weight [B]) with weight 0 on padding
    so loss/metrics are exact. One compiled shape for all batches."""
    n = idx.shape[0]
    order = rng.permutation(n) if shuffle else np.arange(n)
    shuffled = idx[order]
    num_batches = -(-n // batch_size)
    for b in range(num_batches):
        lo = b * batch_size
        hi = min(lo + batch_size, n)
        batch = shuffled[lo:hi]
        w = np.ones(hi - lo, np.float32)
        if hi - lo < batch_size:
            pad = batch_size - (hi - lo)
            # np.resize wraps cyclically, so padding stays correct even when
            # the whole split is smaller than half a batch (pad > n)
            batch = np.concatenate([batch, np.resize(shuffled, pad)])
            w = np.concatenate([w, np.zeros(pad, np.float32)])
        yield batch, w
