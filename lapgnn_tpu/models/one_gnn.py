"""OneGNN: per-row dual predictor with sparse top-k refinement (flax.linen).

TPU-native re-design of ``/root/reference/gnn/one_gnn.py:18-160``: a residual
MLP stack over the 21-D row features predicts row duals u; an optional
top-k=16 column aggregation over the reduced costs injects global structure
(one_gnn.py:122-160).  Column duals are recovered downstream by the min-trick.

Differences from the torch reference (architecture preserved, implementation
TPU-first):
  * ``lax.top_k`` on the negated reduced costs replaces ``torch.topk(...,
    largest=False)`` — one fused device op, no host sync.
  * all dense layers run on the MXU in the caller's compute dtype (bfloat16
    friendly); LayerNorms accumulate in float32.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from ..ops.dual import center_gauge

__all__ = ["OneGNN", "ResidualBlock"]


def _topk_smallest_iter(reduced: jnp.ndarray, k: int) -> jnp.ndarray:
    """k smallest values per row, ascending, duplicates preserved — exactly
    ``-lax.top_k(-reduced, k)[0]`` (incl. lowest-index tie order), but built
    from argmin/one-hot/where, which the GSPMD partitioner keeps row-local
    on a row-sharded operand (lax.top_k forces a full-matrix all-gather;
    verified on the compiled HLO in tests/test_sharded_solver.py)."""

    def body(r, _):
        j = jnp.argmin(r, axis=-1)
        v = jnp.take_along_axis(r, j[..., None], axis=-1)[..., 0]
        oh = jax.nn.one_hot(j, r.shape[-1], dtype=bool)
        return jnp.where(oh, jnp.inf, r), v

    _, vs = lax.scan(body, reduced, None, length=k)
    return jnp.moveaxis(vs, 0, -1)


class ResidualBlock(nn.Module):
    """Post-LN residual MLP block (one_gnn.py:18-36)."""

    hidden: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        y = nn.Dense(self.hidden, name="fc1")(x)
        y = nn.gelu(y, approximate=False)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        y = nn.Dense(self.hidden, name="fc2")(y)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        return nn.LayerNorm(epsilon=1e-5, name="norm")(x + y)


class OneGNN(nn.Module):
    """Row-dual predictor.

    Args mirror OneGNN(in_dim, hidden, layers, dropout, topk)
    (one_gnn.py:50-87).  ``__call__`` takes:

      row_feat: (B, n, F) row features
      cost:     optional (B, n, n) costs — activates the top-k refinement
      mask:     optional (B, n) row-validity mask

    Returns {"u": (B, n)} mean-centered per instance.
    """

    hidden: int = 64
    layers: int = 2
    dropout: float = 0.1
    topk: int = 16
    # Net-new vs the reference: DeepSets-style global context.  The reference
    # OneGNN is per-row independent (plus the top-k refinement), which cannot
    # represent instance-level dual structure — e.g. for rank-1-dominant
    # costs C ≈ a·bᵀ the map row-stats → u_i depends on the whole-instance
    # distribution of the factors.  A masked mean+max pool over rows, mixed
    # back into every row embedding, closes that gap at O(n·hidden) cost
    # (no O(n²) term; one reduction + one broadcast on the VPU).
    context: bool = False
    # "top_k": lax.top_k (fastest single-device).  "iter": k rounds of
    # masked argmin — value-identical incl. tie order, but built from ops
    # the GSPMD partitioner keeps row-local (lax.top_k on a row-sharded
    # operand all-gathers the full matrix); the sharded builders in
    # parallel/ clone the model with this.  Parameters are unaffected.
    topk_impl: str = "top_k"

    @nn.compact
    def __call__(
        self,
        row_feat: jnp.ndarray,
        cost: Optional[jnp.ndarray] = None,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> dict:
        if row_feat.ndim == 2:
            row_feat = row_feat[None]

        h = nn.Dense(self.hidden, name="input_proj")(row_feat)
        h = nn.gelu(h, approximate=False)
        h = nn.LayerNorm(epsilon=1e-5, name="input_norm")(h)

        if self.context:
            h = self._global_context(h, mask)

        for i in range(self.layers):
            h = ResidualBlock(self.hidden, self.dropout, name=f"block_{i}")(
                h, deterministic=deterministic
            )

        u_pre = nn.Dense(1, name="pre_out")(h)[..., 0]

        if cost is not None:
            h = h + self._sparse_refine(h, cost, u_pre, mask, deterministic)

        head_hidden = max(self.hidden // 2, 1)
        y = nn.Dense(head_hidden, name="head_fc1")(h)
        y = nn.gelu(y, approximate=False)
        y = nn.Dropout(self.dropout, deterministic=deterministic)(y)
        u = nn.Dense(1, name="head_fc2")(y)[..., 0]

        u = center_gauge(u, mask=None)  # gauge fix (one_gnn.py:111-113)
        if mask is not None:
            if mask.ndim == 1:
                mask = mask[None]
            u = jnp.where(mask, u, 0.0)
        return {"u": u}

    def _global_context(
        self, h: jnp.ndarray, mask: Optional[jnp.ndarray]
    ) -> jnp.ndarray:
        """Masked mean+max pool over rows → MLP → broadcast back (residual LN).

        Padded rows contribute nothing to the pooled statistics, so a padded
        batch produces the same context vector as the unpadded instance.
        """
        if mask is not None:
            m = (mask if mask.ndim == 2 else mask[None])[..., None]  # (B, n, 1)
            cnt = jnp.maximum(jnp.sum(m, axis=-2), 1.0)
            mean = jnp.sum(jnp.where(m, h, 0.0), axis=-2) / cnt
            mx = jnp.max(jnp.where(m, h, -jnp.inf), axis=-2)
            mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
        else:
            mean = jnp.mean(h, axis=-2)
            mx = jnp.max(h, axis=-2)
        g = jnp.concatenate([mean, mx], axis=-1)  # (B, 2H)
        g = nn.Dense(self.hidden, name="ctx_fc1")(g)
        g = nn.gelu(g, approximate=False)
        g = nn.Dense(self.hidden, name="ctx_fc2")(g)
        return nn.LayerNorm(epsilon=1e-5, name="ctx_norm")(h + g[..., None, :])

    def _sparse_refine(
        self,
        h: jnp.ndarray,
        cost: jnp.ndarray,
        u_pre: jnp.ndarray,
        mask: Optional[jnp.ndarray],
        deterministic: bool,
    ) -> jnp.ndarray:
        """Top-k smallest reduced-cost aggregation (one_gnn.py:122-160).

        For each row: take the k smallest entries of (C - u_pre), softmax
        their negations as attention weights over an edge-MLP embedding of the
        values, and emit the weighted sum as a message.
        """
        k = min(self.topk, cost.shape[-1])
        if k <= 0 or h.shape[-2] == 0:
            return jnp.zeros_like(h)

        reduced = cost - u_pre[..., :, None]
        if mask is not None:
            mask_rows = mask if mask.ndim == 2 else mask[None]
            reduced = jnp.where(mask_rows[..., :, None], reduced, jnp.inf)

        if self.topk_impl == "iter":
            values = _topk_smallest_iter(reduced, k)  # (B, n, k) ascending
            neg_vals = -values
        else:
            neg_vals, _ = lax.top_k(-reduced, k)  # (B, n, k): negated k-smallest
            values = -neg_vals
        valid = jnp.isfinite(values)
        scores = jnp.where(valid, neg_vals, -jnp.inf)
        weights = jax.nn.softmax(scores, axis=-1)
        weights = jnp.where(valid, weights, 0.0)

        edge_in = jnp.where(valid, values, 0.0)[..., None]  # (B, n, k, 1)
        e = nn.Dense(self.hidden, name="edge_fc1")(edge_in)
        e = nn.gelu(e, approximate=False)
        e = nn.Dense(self.hidden, name="edge_fc2")(e)  # (B, n, k, H)

        message = jnp.sum(weights[..., None] * e, axis=-2)  # (B, n, H)
        if mask is not None:
            message = message * mask_rows[..., :, None]

        message = nn.Dropout(self.dropout, deterministic=deterministic)(message)
        return nn.LayerNorm(epsilon=1e-5, name="message_norm")(message)
