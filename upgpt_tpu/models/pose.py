"""Pose conditioning: SMPL parameter vector -> one 768-dim context token.

Reference ldm/modules/poses/poses.py:3-16: `LinearProject` is a single
nn.Linear(85, 768) over the concatenated SMPL body pose (72) + betas (10) +
camera (3) vector; `DummyModel` passes precomputed embeddings through
unchanged (used at inference when styles/poses arrive pre-embedded,
generate_utils.py:142).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class LinearProject(nn.Module):
    input_dim: int = 85
    output_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """(B, n, input_dim) or (B, input_dim) -> (B, n, output_dim)."""
        if x.ndim == 2:
            x = x[:, None, :]
        return nn.Dense(self.output_dim, dtype=self.dtype, name="proj")(
            x.astype(self.dtype)
        )


class DummyModel(nn.Module):
    """Identity passthrough for precomputed conditioning embeddings."""

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return x
