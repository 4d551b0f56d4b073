"""Complex-valued heads for magnetic-Laplacian models.

The reference ships these only as fully commented-out dead code
(``SSRG/models/base_scalable/complex_models.py`` — ComMLP/ComLogReg/
Com2LayerGCN — and ``complex_relu.py``; SURVEY.md §2.5: "capability exists
only at operator level"). Here they are working modules so the magnetic
operator tier (``ops.normalize.magnetic_norm`` + ``ops.propagate_complex``)
has a trainable end-to-end path:

- :func:`complex_relu` — MagNet's complex ReLU: pass (re, im) through when
  the REAL part is nonnegative, zero otherwise (Zhang et al., MagNet).
- :class:`ComplexLinear` — one complex matmul as 4 real MXU matmuls.
- :class:`ComMLP` / :class:`ComLogisticRegression` — complex feature trunk;
  the final logits take |z| (magnitude readout).
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def complex_relu(re: jnp.ndarray, im: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """MagNet complex ReLU (reference complex_relu.py, commented): mask both
    parts by sign(re) >= 0."""
    mask = (re >= 0).astype(re.dtype)
    return re * mask, im * mask


class ComplexLinear(nn.Module):
    """(re + i*im) @ (W_re + i*W_im) + (b_re + i*b_im)."""

    features: int

    @nn.compact
    def __call__(self, re, im):
        w_re = self.param(
            "w_re", nn.initializers.xavier_uniform(), (re.shape[-1], self.features)
        )
        w_im = self.param(
            "w_im", nn.initializers.xavier_uniform(), (re.shape[-1], self.features)
        )
        b_re = self.param("b_re", nn.initializers.zeros, (self.features,))
        b_im = self.param("b_im", nn.initializers.zeros, (self.features,))
        out_re = (
            jnp.dot(re, w_re, preferred_element_type=jnp.float32)
            - jnp.dot(im, w_im, preferred_element_type=jnp.float32)
            + b_re
        )
        out_im = (
            jnp.dot(re, w_im, preferred_element_type=jnp.float32)
            + jnp.dot(im, w_re, preferred_element_type=jnp.float32)
            + b_im
        )
        return out_re, out_im


class ComLogisticRegression(nn.Module):
    """Complex linear head with magnitude readout (ComLogReg equivalent)."""

    output_dim: int

    @nn.compact
    def __call__(self, re_im, train: bool = False, query_edges=None):
        re, im = re_im
        re, im = ComplexLinear(self.output_dim, name="fc")(re, im)
        return jnp.sqrt(re * re + im * im + 1e-12)


class ComMLP(nn.Module):
    """Complex MLP head (ComMLP equivalent): complex layers + complex ReLU,
    magnitude readout into the class dimension."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 2
    dropout: float = 0.5

    @nn.compact
    def __call__(self, re_im, train: bool = False, query_edges=None):
        re, im = re_im
        for i in range(self.num_layers - 1):
            re, im = ComplexLinear(self.hidden_dim, name=f"fc_{i}")(re, im)
            re, im = complex_relu(re, im)
            drop = nn.Dropout(self.dropout, deterministic=not train)
            re, im = drop(re), drop(im)
        re, im = ComplexLinear(self.output_dim, name="fc_out")(re, im)
        return jnp.sqrt(re * re + im * im + 1e-12)
