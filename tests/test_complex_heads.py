"""Complex heads + magnetic end-to-end: train a ComMLP over magnetic
propagation on a directed synthetic graph (SURVEY.md §2.5 — the reference
ships these only as dead code; here the path works)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import scipy.sparse as sp

from ssrg_tpu.models.complex_heads import ComMLP, ComplexLinear, complex_relu
from ssrg_tpu.models.heads import (
    FastOneDimConvolution,
    OneDimConvolution,
    OneDimConvolutionWeightSharedAcrossFeatures,
)
from ssrg_tpu.ops.normalize import magnetic_norm
from ssrg_tpu.ops.propagate import propagate_complex
from ssrg_tpu.ops.sparse import build_dense


def test_complex_relu_masks_by_real_sign():
    re = jnp.asarray([[1.0, -2.0], [0.0, 3.0]])
    im = jnp.asarray([[5.0, 6.0], [7.0, -8.0]])
    out_re, out_im = complex_relu(re, im)
    np.testing.assert_allclose(np.asarray(out_re), [[1, 0], [0, 3]])
    np.testing.assert_allclose(np.asarray(out_im), [[5, 0], [7, -8]])


def test_complex_linear_matches_numpy_complex():
    rng = np.random.default_rng(0)
    re = rng.normal(size=(6, 5)).astype(np.float32)
    im = rng.normal(size=(6, 5)).astype(np.float32)
    layer = ComplexLinear(4)
    variables = layer.init(jax.random.PRNGKey(0), re, im)
    o_re, o_im = layer.apply(variables, re, im)
    w = np.asarray(variables["params"]["w_re"]) + 1j * np.asarray(
        variables["params"]["w_im"]
    )
    b = np.asarray(variables["params"]["b_re"]) + 1j * np.asarray(
        variables["params"]["b_im"]
    )
    expected = (re + 1j * im) @ w + b
    np.testing.assert_allclose(np.asarray(o_re), expected.real, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_im), expected.imag, rtol=1e-4, atol=1e-5)


def test_magnetic_com_mlp_trains():
    """Directed SBM-ish graph: direction encodes class info; magnetic
    propagation + ComMLP should learn it."""
    rng = np.random.default_rng(1)
    n, f, c = 300, 24, 3
    y = rng.integers(0, c, n)
    # directed edges mostly from class k to class (k+1)%c
    src = rng.integers(0, n, 2500)
    dst = rng.integers(0, n, 2500)
    keep = ((y[src] + 1) % c == y[dst]) | (rng.uniform(size=2500) < 0.1)
    src, dst = src[keep], dst[keep]
    adj = sp.csr_matrix(
        (np.ones(src.shape[0], np.float32), (src, dst)), shape=(n, n)
    )
    x = (rng.normal(size=(c, f))[y] + rng.normal(size=(n, f))).astype(np.float32)

    re_m, im_m = magnetic_norm(adj, 0.5, 0.1)
    re_hops, im_hops = propagate_complex(
        build_dense(re_m), build_dense(im_m), jnp.asarray(x), 2
    )
    re_feat, im_feat = re_hops[-1], im_hops[-1]

    module = ComMLP(hidden_dim=32, output_dim=c, dropout=0.0)
    params = module.init(jax.random.PRNGKey(0), (re_feat, im_feat))["params"]
    tx = optax.adam(0.01)
    opt_state = tx.init(params)
    y_dev = jnp.asarray(y)
    train_idx = jnp.asarray(np.arange(0, 200))
    test_idx = np.arange(200, n)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = module.apply({"params": p}, (re_feat, im_feat))
            return optax.softmax_cross_entropy_with_integer_labels(
                logits[train_idx], y_dev[train_idx]
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(150):
        params, opt_state, loss = step(params, opt_state)
    logits = module.apply({"params": params}, (re_feat, im_feat))
    acc = float(np.mean(np.asarray(jnp.argmax(logits, 1))[test_idx] == y[test_idx]))
    assert acc > 0.6, f"magnetic ComMLP acc {acc:.3f}"


def test_one_dim_convolutions():
    rng = np.random.default_rng(2)
    hops = jnp.asarray(rng.normal(size=(3, 12, 5)).astype(np.float32))
    m1 = OneDimConvolution()
    v1 = m1.init(jax.random.PRNGKey(0), hops)
    np.testing.assert_allclose(
        np.asarray(m1.apply(v1, hops)), np.asarray(hops).sum(0), rtol=1e-5
    )
    m2 = OneDimConvolutionWeightSharedAcrossFeatures(num_nodes=12)
    v2 = m2.init(jax.random.PRNGKey(0), hops)
    assert m2.apply(v2, hops).shape == (12, 5)
    stacked = jnp.transpose(hops, (1, 0, 2))
    m3 = FastOneDimConvolution()
    v3 = m3.init(jax.random.PRNGKey(0), stacked)
    np.testing.assert_allclose(
        np.asarray(m3.apply(v3, stacked)), np.asarray(hops).sum(0), rtol=1e-5
    )
