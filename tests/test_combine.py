"""Message-operator combiners vs direct numpy formulas (SURVEY.md §2.4):
all thirteen hop-combination schemes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ssrg_tpu.ops import combine


@pytest.fixture
def hops():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.normal(size=(4, 10, 6)).astype(np.float32))


def _apply(module, hops, **kwargs):
    variables = module.init(jax.random.PRNGKey(0), hops, **kwargs)
    return np.asarray(module.apply(variables, hops, **kwargs)), variables


def test_simple_combiners(hops):
    h = np.asarray(hops)
    cases = {
        "last": h[-1],
        "sum": h.sum(0),
        "mean": h.mean(0),
        "max": h.max(0),
        "min": h.min(0),
    }
    for name, expected in cases.items():
        out, _ = _apply(combine.make_message_op(name), hops)
        np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_concat_order(hops):
    out, _ = _apply(combine.make_message_op("concat"), hops)
    h = np.asarray(hops)
    expected = np.concatenate([h[k] for k in range(h.shape[0])], axis=1)
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_slice_bounds(hops):
    out, _ = _apply(combine.SimpleMessageOp(kind="sum", start=1, end=3), hops)
    np.testing.assert_allclose(out, np.asarray(hops)[1:3].sum(0), rtol=1e-6)


def test_alpha_weights_match_reference_recurrence():
    # reference builds w_0 = alpha, w_{k+1} = (1-alpha) * w_k
    # (simple_weighted_message_op.py:42-48)
    alpha = 0.3
    w = np.asarray(combine.alpha_decay_weights(5, alpha))
    ref = [alpha]
    for _ in range(4):
        ref.append((1 - alpha) * ref[-1])
    np.testing.assert_allclose(w, ref, rtol=1e-6)


def test_simple_weighted_alpha(hops):
    out, _ = _apply(
        combine.SimpleWeightedMessageOp(combination_type="alpha", alpha=0.5), hops
    )
    h = np.asarray(hops)
    w = np.asarray(combine.alpha_decay_weights(4, 0.5))
    np.testing.assert_allclose(out, np.einsum("k,knf->nf", w, h), rtol=1e-5)


def test_hand_crafted_weights(hops):
    w = [0.1, 0.2, 0.3, 0.4]
    out, _ = _apply(
        combine.SimpleWeightedMessageOp(
            combination_type="hand_crafted", weight_list=w
        ),
        hops,
    )
    np.testing.assert_allclose(
        out, np.einsum("k,knf->nf", np.asarray(w), np.asarray(hops)), rtol=1e-5
    )


def test_over_smooth_matches_loop(hops):
    """NAFS vectorization vs the reference's per-node loop semantics
    (over_smooth_distance_op.py:11-33)."""
    h = np.asarray(hops)
    k, n, f = h.shape
    ref_feat = h[0]
    norm0 = np.linalg.norm(ref_feat, axis=1) + 1e-10
    weights = []
    for hk in h:
        normk = np.linalg.norm(hk, axis=1) + 1e-10
        weights.append(((ref_feat * hk).sum(1) / normk / norm0)[:, None])
    w = np.concatenate(weights, axis=1)
    w = np.exp(w) / np.exp(w).sum(1, keepdims=True)
    expected = np.zeros((n, f), np.float32)
    for i in range(n):
        for j in range(k):
            expected[i] += w[i, j] * h[j, i]
    out, _ = _apply(combine.make_message_op("over_smooth_dis_weighted"), hops)
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize(
    "ct", ["simple", "simple_allow_neg", "gate", "ori_ref", "jk"]
)
def test_learnable_weighted_shapes(hops, ct):
    mod = combine.LearnableWeightedMessageOp(
        combination_type=ct, prop_steps=3, feat_dim=6
    )
    out, variables = _apply(mod, hops)
    assert out.shape == (10, 6)
    assert np.isfinite(out).all()
    leaves = jax.tree_util.tree_leaves(variables)
    assert len(leaves) > 0  # has parameters


def test_learnable_simple_is_convex_combination(hops):
    mod = combine.LearnableWeightedMessageOp(combination_type="simple", prop_steps=3)
    variables = mod.init(jax.random.PRNGKey(1), hops)
    out = np.asarray(mod.apply(variables, hops))
    w_param = np.asarray(variables["params"]["hop_weight"]).reshape(-1)
    sig = 1 / (1 + np.exp(-w_param))
    w = np.exp(sig) / np.exp(sig).sum()
    np.testing.assert_allclose(
        out, np.einsum("k,knf->nf", w, np.asarray(hops)), rtol=1e-4, atol=1e-6
    )


def test_iterate_learnable(hops):
    out, _ = _apply(combine.IterateLearnableWeightedMessageOp(), hops)
    assert out.shape == (10, 6)
    assert np.isfinite(out).all()


def test_projected_concat_shapes(hops):
    mod = combine.ProjectedConcatMessageOp(hidden_dim=8, num_layers=2)
    variables = mod.init(jax.random.PRNGKey(0), hops, train=False)
    out = np.asarray(mod.apply(variables, hops, train=False))
    assert out.shape == (10, 4 * 8)
    # hops >= 1 pass relu: their blocks are nonnegative
    assert (out[:, 8:] >= 0).all()


def test_multi_and_complex_combiners(hops):
    h2 = hops * 2.0
    lasts = combine.combine_multi_last((hops, h2))
    np.testing.assert_allclose(np.asarray(lasts[0]) * 2, np.asarray(lasts[1]))
    re_out, im_out = combine.combine_complex(hops, h2, fn=combine.combine_mean)
    np.testing.assert_allclose(np.asarray(re_out) * 2, np.asarray(im_out), rtol=1e-6)
