"""Inference/serving path: load a trained checkpoint and predict.

The reference has no inference entry point (training scripts keep the best
model only in memory; SURVEY.md §5 checkpoint row). This module closes that
gap for deployment: a :class:`Predictor` runs the one-time precompute, loads
best-val params from a ``cache.save_params`` checkpoint, and serves jitted
batched predictions.

>>> task = NodeClassification(ds, spec, mc, tc)          # writes checkpoint
>>> pred = Predictor(ds, spec, mc, tc, tc.checkpoint_path)
>>> labels = pred.predict(node_ids)                      # int labels
>>> probs  = pred.predict_proba(node_ids)                # softmax scores
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ssrg_tpu.cache import load_metadata, load_params
from ssrg_tpu.configs.config import ModelConfig, TrainingConfig
from ssrg_tpu.models.zoo import ModelSpec
from ssrg_tpu.train.node_classification import prepare


class Predictor:
    """Checkpoint-backed node-classification inference.

    Runs ``prepare`` (normalization + K-hop precompute + non-learnable
    aggregation) once, restores params, and serves predictions for arbitrary
    node-id batches. The adjacency/inputs flow through jit as arguments
    (see docs/PERFORMANCE.md on closure capture).
    """

    def __init__(
        self,
        dataset,
        spec: ModelSpec,
        model_cfg: ModelConfig,
        training_cfg: Optional[TrainingConfig] = None,
        checkpoint_path: Optional[str] = None,
    ):
        training_cfg = training_cfg or TrainingConfig()
        self.spec = spec
        self.prepared = prepare(spec, dataset, model_cfg, training_cfg)
        p = self.prepared

        # init a param template, then restore the checkpoint over it
        rng = jax.random.PRNGKey(0)
        if p.adj_device is not None:
            init_inputs, init_kwargs = p.inputs, {"adj": p.adj_device}
        elif p.hops_layout:
            init_inputs, init_kwargs = p.inputs[:, :2], {}
        elif isinstance(p.inputs, tuple):
            init_inputs = tuple(part[:2] for part in p.inputs)
            init_kwargs = {}
        else:
            init_inputs, init_kwargs = p.inputs[:2], {}
        variables = p.module.init(
            {"params": rng, "dropout": rng}, init_inputs, train=False,
            **init_kwargs,
        )
        params = variables["params"]
        batch_stats = variables.get("batch_stats")
        self.metadata = None
        if checkpoint_path:
            self.metadata = load_metadata(checkpoint_path)
            if (self.metadata or {}).get("has_bn"):
                restored = load_params(
                    {"params": params, "batch_stats": batch_stats},
                    checkpoint_path,
                )
                params = restored["params"]
                batch_stats = restored["batch_stats"]
            else:
                if batch_stats is not None:
                    raise ValueError(
                        "model has BatchNorm but the checkpoint stores "
                        "params only (pre-batch_stats format); retrain with "
                        "checkpoint_path to produce a BN-aware checkpoint"
                    )
                params = load_params(params, checkpoint_path)
        self.params = params
        self._batch_stats = batch_stats

        module = p.module
        has_bn = self._batch_stats is not None

        @jax.jit
        def forward(adj, params, batch_stats, inputs):
            variables = {"params": params}
            if has_bn:
                variables["batch_stats"] = batch_stats
            kwargs = {"adj": adj} if adj is not None else {}
            return module.apply(variables, inputs, train=False, **kwargs)

        self._forward = partial(forward, p.adj_device)

    def logits(self, node_ids) -> np.ndarray:
        from ssrg_tpu.train.node_classification import slice_inputs

        ids = np.asarray(node_ids).reshape(-1)
        n = ids.shape[0]
        p = self.prepared
        if p.adj_device is not None:  # full-graph models (GCN / spectral)
            out = self._forward(self.params, self._batch_stats, p.inputs)
            return np.asarray(out[jnp.asarray(ids)])
        # pad the batch to the next power of two so varying request sizes
        # reuse a small set of compiled shapes (each new shape would
        # otherwise recompile the serving function)
        n_pad = 1 << max(int(np.ceil(np.log2(max(n, 1)))), 3)
        ids_pad = np.zeros(n_pad, ids.dtype)
        ids_pad[:n] = ids
        idx = jnp.asarray(ids_pad)
        out = self._forward(self.params, self._batch_stats,
                            slice_inputs(p, idx))
        return np.asarray(out)[:n]

    def predict_proba(self, node_ids) -> np.ndarray:
        return np.asarray(jax.nn.softmax(self.logits(node_ids), axis=-1))

    def predict(self, node_ids) -> np.ndarray:
        return np.argmax(self.logits(node_ids), axis=-1)
