"""Message operators — the thirteen hop-combination schemes.

Vectorized, pure-JAX re-designs of the reference's message operator zoo
(``SSRG/operators/message_operator/*``; SURVEY.md §2.4). Every combiner
consumes the stacked hop tensor ``hops`` of shape ``[K+1, n, F]`` (already
sliced to the minibatch when aggregation is learnable) and returns ``[n, D]``.
Learnable combiners are flax linen modules; unlearnable ones are modules
without parameters so the model layer stays uniform.

Intentional fixes vs the reference (SURVEY.md §2.13):

- ``ori_ref``/``jk`` reshape scores hop-major (``[K, n] -> [n, K]``); the
  reference's ``.view(-1, K)`` scrambles node/hop pairs
  (``learnable_weighted_messahe_op.py:80-90``). ``gate``'s ``.view(K, -1).T``
  was already correct and is matched.
- NAFS ``over_smooth_dis_weighted`` is one einsum instead of the O(N*K)
  Python loop (``over_smooth_distance_op.py:26-32``).

``aggr_type`` strings match the reference so model factories and the
"learnable aggregation happens per-batch in forward" special-casing
(``base_model.py:38-44``) carry over.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

LEARNABLE_AGGR_TYPES = frozenset(
    {"proj_concat", "learnable_weighted", "iterate_learnable_weighted"}
)


def _slice_hops(hops: jnp.ndarray, start: Optional[int], end: Optional[int]):
    return hops[slice(start, end)]


# ---------------------------------------------------------------------------
# Unlearnable combiners (pure functions + module wrappers)
# ---------------------------------------------------------------------------


def combine_last(hops, start=None, end=None):
    """reference: last_message_op.py:4-10 (SGC)"""
    return _slice_hops(hops, start, end)[-1]


def combine_sum(hops, start=None, end=None):
    return _slice_hops(hops, start, end).sum(axis=0)


def combine_mean(hops, start=None, end=None):
    """reference: mean_message_op.py:4-10 (SSGC)"""
    return _slice_hops(hops, start, end).mean(axis=0)


def combine_max(hops, start=None, end=None):
    return _slice_hops(hops, start, end).max(axis=0)


def combine_min(hops, start=None, end=None):
    return _slice_hops(hops, start, end).min(axis=0)


def combine_concat(hops, start=None, end=None):
    """Hop-order feature concat [X_s | X_{s+1} | ...] (concat_message_op.py)."""
    h = _slice_hops(hops, start, end)
    k, n, f = h.shape
    return jnp.transpose(h, (1, 0, 2)).reshape(n, k * f)


def alpha_decay_weights(num_hops: int, alpha: float) -> jnp.ndarray:
    """GBP weights w_k = alpha * (1-alpha)^k (simple_weighted_message_op.py:42-48)."""
    k = jnp.arange(num_hops)
    return alpha * (1.0 - alpha) ** k


def combine_weighted(hops, weights):
    """Scalar-per-hop weighted sum: out = sum_k w_k * H_k
    (operators/utils.py:426-437 one_dim_weighted_add)."""
    return jnp.einsum("k,knf->nf", weights, hops, preferred_element_type=jnp.float32)


def combine_node_weighted(hops, weights):
    """Per-node weighted sum: weights [n, K], hops [K, n, F]
    (operators/utils.py:439-450 two_dim_weighted_add)."""
    return jnp.einsum("nk,knf->nf", weights, hops, preferred_element_type=jnp.float32)


def combine_over_smooth(hops, start=None, end=None, eps: float = 1e-10):
    """NAFS over-smoothing-distance weights, fully vectorized
    (over_smooth_distance_op.py:11-33): per-node cosine similarity of each hop
    to hop 0, softmax over hops, weighted sum."""
    h = _slice_hops(hops, start, end)
    ref = h[0]  # [n, F]
    ref_norm = jnp.linalg.norm(ref, axis=1) + eps            # [n]
    hop_norm = jnp.linalg.norm(h, axis=2) + eps              # [K, n]
    cos = jnp.einsum("nf,knf->kn", ref, h) / (hop_norm * ref_norm[None, :])
    w = jax.nn.softmax(cos.T, axis=1)                        # [n, K]
    return combine_node_weighted(h, w)


class SimpleMessageOp(nn.Module):
    """Parameter-free combiner wrapper; ``kind`` selects the pure function."""

    kind: str
    start: Optional[int] = None
    end: Optional[int] = None

    @property
    def aggr_type(self) -> str:
        return {
            "last": "last",
            "sum": "sum",
            "mean": "mean",
            "max": "max",
            "min": "min",
            "concat": "concat",
            "over_smooth": "over_smooth_dis_weighted",
        }[self.kind]

    @nn.compact
    def __call__(self, hops):
        fn = {
            "last": combine_last,
            "sum": combine_sum,
            "mean": combine_mean,
            "max": combine_max,
            "min": combine_min,
            "concat": combine_concat,
            "over_smooth": combine_over_smooth,
        }[self.kind]
        return fn(hops, self.start, self.end)


class SimpleWeightedMessageOp(nn.Module):
    """Fixed-weight combiner: alpha-geometric decay or hand-crafted weights
    (simple_weighted_message_op.py:9-56; GBP uses "alpha")."""

    start: Optional[int] = None
    end: Optional[int] = None
    combination_type: str = "alpha"
    alpha: float = 0.5
    weight_list: Optional[Sequence[float]] = None
    aggr_type: str = "simple_weighted"

    @nn.compact
    def __call__(self, hops):
        num_hops = hops.shape[0]
        if self.combination_type == "alpha":
            w = alpha_decay_weights(num_hops, self.alpha)
        elif self.combination_type == "hand_crafted":
            w = jnp.asarray(self.weight_list, dtype=jnp.float32)
        else:
            raise ValueError(self.combination_type)
        w = w[slice(self.start, self.end)]
        return combine_weighted(_slice_hops(hops, self.start, self.end), w)


# ---------------------------------------------------------------------------
# Learnable combiners
# ---------------------------------------------------------------------------


class LearnableWeightedMessageOp(nn.Module):
    """Five trainable weighting schemes over hops
    (learnable_weighted_messahe_op.py:10-105):

    - ``simple``          softmax(sigmoid(w_k)) scalar per hop
    - ``simple_allow_neg``raw scalar per hop
    - ``gate``            per-node Linear(F -> 1) score per hop
    - ``ori_ref``         score of [H_0 | H_k] per (node, hop)
    - ``jk``              score of [concat-all-hops | H_k] (GAMLP)
    """

    combination_type: str
    prop_steps: Optional[int] = None
    feat_dim: Optional[int] = None
    start: Optional[int] = None
    end: Optional[int] = None
    aggr_type: str = "learnable_weighted"

    @nn.compact
    def __call__(self, hops):
        h = _slice_hops(hops, self.start, self.end)
        k, n, f = h.shape
        ct = self.combination_type
        if ct in ("simple", "simple_allow_neg"):
            steps = (self.prop_steps if self.prop_steps is not None else hops.shape[0] - 1) + 1
            w_param = self.param(
                "hop_weight", nn.initializers.xavier_normal(), (1, steps)
            ).reshape(-1)[slice(self.start, self.end)]
            if ct == "simple":
                w = jax.nn.softmax(jax.nn.sigmoid(w_param))
            else:
                w = w_param
            return combine_weighted(h, w)

        if ct == "gate":
            score = nn.Dense(1, name="gate")(h)                 # [K, n, 1]
            w = jax.nn.softmax(jax.nn.sigmoid(score[..., 0]).T, axis=1)  # [n, K]
            return combine_node_weighted(h, w)

        if ct == "ori_ref":
            ref = jnp.broadcast_to(h[0][None], (k, n, f))
            score = nn.Dense(1, name="ori_ref")(
                jnp.concatenate([ref, h], axis=-1)
            )                                                   # [K, n, 1]
            w = jax.nn.softmax(jax.nn.sigmoid(score[..., 0]).T, axis=1)
            return combine_node_weighted(h, w)

        if ct == "jk":
            all_cat = combine_concat(hops)                      # [n, (K+1)*F]
            ref = jnp.broadcast_to(all_cat[None], (k, n, all_cat.shape[1]))
            score = nn.Dense(1, name="jk")(
                jnp.concatenate([ref, h], axis=-1)
            )
            w = jax.nn.softmax(jax.nn.sigmoid(score[..., 0]).T, axis=1)
            return combine_node_weighted(h, w)

        raise ValueError(f"unknown combination_type {ct!r}")


class IterateLearnableWeightedMessageOp(nn.Module):
    """Recursive gating: fold hops in one at a time, re-softmaxing the weight
    vector at each step (iterate_learnable_weighted_message_op.py:8-51).
    K is small and static, so the Python loop unrolls under jit."""

    start: Optional[int] = None
    end: Optional[int] = None
    aggr_type: str = "iterate_learnable_weighted"

    @nn.compact
    def __call__(self, hops):
        h = _slice_hops(hops, self.start, self.end)
        k, n, f = h.shape
        gate = nn.Dense(1, name="recursive_gate")
        weighted = h[0]
        weights = None
        for i in range(k):
            s = jax.nn.sigmoid(gate(jnp.concatenate([h[i], weighted], axis=-1)))
            weights = s if i == 0 else jnp.concatenate([weights, s], axis=1)
            weights = jax.nn.softmax(weights, axis=1)
            weighted = combine_node_weighted(h[: i + 1], weights)
        return weighted


class ProjectedConcatMessageOp(nn.Module):
    """SIGN: per-hop MLP projection then concat
    (projected_concat_message_op.py:11-30). Hop 0's projection is taken raw,
    hops >= 1 pass through relu, matching the reference."""

    hidden_dim: int
    num_layers: int
    dropout: float = 0.5
    start: Optional[int] = None
    end: Optional[int] = None
    aggr_type: str = "proj_concat"

    @nn.compact
    def __call__(self, hops, train: bool = False):
        from ssrg_tpu.models.heads import MultiLayerPerceptron

        h = _slice_hops(hops, self.start, self.end)
        k = h.shape[0]
        outs = []
        for i in range(k):
            proj = MultiLayerPerceptron(
                hidden_dim=self.hidden_dim,
                output_dim=self.hidden_dim,
                num_layers=self.num_layers,
                dropout=self.dropout,
                name=f"proj_{i}",
            )(h[i], train=train)
            outs.append(proj if i == 0 else jax.nn.relu(proj))
        return jnp.concatenate(outs, axis=-1)


# ---------------------------------------------------------------------------
# Multi-list combiners (pair / triple hop stacks)
# ---------------------------------------------------------------------------


def combine_multi_last(hop_stacks, start=None, end=None):
    """Per-stack ``last`` over a tuple of hop stacks — the reference's
    TwoDirLastMessageOp / TwoOrderLastMessageOp
    (twodir_message_operator/twodir_last_message_op.py:4-10,
    twoorder_message_operator/twoorder_last_message_op.py:4-10)."""
    return tuple(combine_last(h, start, end) for h in hop_stacks)


def combine_complex(re_hops, im_hops, fn=combine_last, **kwargs):
    """Apply a combiner to the (real, imag) pair from magnetic propagation —
    the reference's ComMessageOp aggregate protocol
    (base_operator.py:212-234)."""
    return fn(re_hops, **kwargs), fn(im_hops, **kwargs)


# ---------------------------------------------------------------------------
# Factory
# ---------------------------------------------------------------------------


def make_message_op(aggr_type: str, **kwargs) -> nn.Module:
    """Build a message op by reference aggr_type string (SURVEY.md §2.4)."""
    simple = {
        "last": "last",
        "sum": "sum",
        "mean": "mean",
        "max": "max",
        "min": "min",
        "concat": "concat",
        "over_smooth_dis_weighted": "over_smooth",
    }
    if aggr_type in simple:
        return SimpleMessageOp(kind=simple[aggr_type], **kwargs)
    if aggr_type == "simple_weighted":
        return SimpleWeightedMessageOp(**kwargs)
    if aggr_type == "learnable_weighted":
        return LearnableWeightedMessageOp(**kwargs)
    if aggr_type == "iterate_learnable_weighted":
        return IterateLearnableWeightedMessageOp(**kwargs)
    if aggr_type == "proj_concat":
        return ProjectedConcatMessageOp(**kwargs)
    raise ValueError(f"unknown aggr_type {aggr_type!r}")
