"""DualGNN: bipartite GATv2-style dual predictor (flax.linen).

TPU-native re-design of ``/root/reference/gnn/dual_gnn.py:17-204``: row and
column node embeddings exchange messages through multi-head attention over
the dense n x n edge-feature tensor; heads score each (row, col) edge from
[row, col, edge] embeddings.  Serves as the accuracy gold standard (the
reference runs it at n <= 2048 only; it is O(n^2 * hidden) memory).

TPU-first deviation: the reference materialises a (B, N, N, heads, 3*head_dim)
concatenated score tensor (dual_gnn.py:90-98).  Since the score is linear in
the concatenation, we split the attention weight into row/col/edge parts and
compute  score_ij = <w_r, row_i> + <w_c, col_j> + <w_e, e_ij> + b  — two
(B, N, H) einsums broadcast against one (B, N, N, H) einsum.  This removes a
3x-hidden intermediate that XLA cannot always fuse away and keeps the matmuls
MXU-shaped.  Numerics are identical.
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["DualGNN", "DualLayer"]


class DualLayer(nn.Module):
    """One bidirectional attention round (dual_gnn.py:17-143)."""

    hidden_dim: int
    heads: int = 4
    dropout: float = 0.1

    def setup(self):
        if self.hidden_dim % self.heads != 0:
            raise ValueError("hidden_dim must be divisible by heads")
        hd = self.hidden_dim // self.heads
        self.head_dim = hd
        self.row_proj = nn.Dense(self.hidden_dim, use_bias=False)
        self.col_proj = nn.Dense(self.hidden_dim, use_bias=False)
        self.row_val = nn.Dense(self.hidden_dim, use_bias=False)
        self.col_val = nn.Dense(self.hidden_dim, use_bias=False)
        # Attention weights split into (row, col, edge) thirds; see module doc.
        init = nn.initializers.xavier_uniform()
        self.attn_row = self.param("attn_row", init, (self.heads, 3, hd))
        self.attn_col = self.param("attn_col", init, (self.heads, 3, hd))
        self.attn_row_bias = self.param(
            "attn_row_bias", nn.initializers.zeros, (self.heads,)
        )
        self.attn_col_bias = self.param(
            "attn_col_bias", nn.initializers.zeros, (self.heads,)
        )
        self.edge_fc1 = nn.Dense(128)
        self.edge_fc2 = nn.Dense(128)
        self.edge_fc3 = nn.Dense(self.hidden_dim)
        self.row_update = nn.Dense(self.hidden_dim)
        self.col_update = nn.Dense(self.hidden_dim)
        self.row_norm = nn.LayerNorm(epsilon=1e-5)
        self.col_norm = nn.LayerNorm(epsilon=1e-5)
        self.drop = nn.Dropout(self.dropout)

    def _heads(self, x: jnp.ndarray) -> jnp.ndarray:
        B, N, _ = x.shape
        return x.reshape(B, N, self.heads, self.head_dim)

    def _attention(
        self,
        src_term: jnp.ndarray,   # (B, N, H) contribution of the softmax-side axis
        dst_term: jnp.ndarray,   # (B, N, H) contribution of the receiving axis
        edge_term: jnp.ndarray,  # (B, N, N, H)
        bias: jnp.ndarray,       # (H,)
        values: jnp.ndarray,     # (B, N, H, D) values indexed by the softmax axis
        mask: jnp.ndarray,       # (B, N) bool
        deterministic: bool,
    ) -> jnp.ndarray:
        # score[b, i, j, h]: receiver i attends over j.
        score = (
            dst_term[:, :, None, :] + src_term[:, None, :, :] + edge_term
            + bias[None, None, None, :]
        )
        score = nn.leaky_relu(score, negative_slope=0.2)
        neg_inf = jnp.asarray(-jnp.inf, score.dtype)
        score = jnp.where(mask[:, :, None, None], score, neg_inf)
        score = jnp.where(mask[:, None, :, None], score, neg_inf)
        w = jax.nn.softmax(score, axis=2)
        w = jnp.where(jnp.isfinite(w), w, 0.0)
        w = self.drop(w, deterministic=deterministic)
        # (B, i, j, h) x (B, j, h, d) -> (B, i, h, d)
        msg = jnp.einsum("bijh,bjhd->bihd", w, values)
        B, N = msg.shape[:2]
        return msg.reshape(B, N, self.hidden_dim)

    def __call__(
        self,
        edge_feat: jnp.ndarray,
        row_embed: jnp.ndarray,
        col_embed: jnp.ndarray,
        mask: Optional[jnp.ndarray],
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        B, N = row_embed.shape[:2]
        if mask is None:
            mask = jnp.ones((B, N), jnp.bool_)

        e = self.edge_fc1(edge_feat)
        e = nn.gelu(e, approximate=False)
        e = self.drop(e, deterministic=deterministic)
        e = self.edge_fc2(e)
        e = nn.gelu(e, approximate=False)
        e = self.edge_fc3(e)  # (B, N, N, hidden)
        e_heads = e.reshape(B, N, N, self.heads, self.head_dim)

        rp = self._heads(self.row_proj(row_embed))  # (B, N, H, D)
        cp = self._heads(self.col_proj(col_embed))
        rv = self._heads(self.row_val(row_embed))
        cv = self._heads(self.col_val(col_embed))

        # Row -> Col direction: rows receive from columns.
        r_dst = jnp.einsum("bnhd,hd->bnh", rp, self.attn_row[:, 0])
        r_src = jnp.einsum("bnhd,hd->bnh", cp, self.attn_row[:, 1])
        r_edge = jnp.einsum("bijhd,hd->bijh", e_heads, self.attn_row[:, 2])
        row_message = self._attention(
            r_src, r_dst, r_edge, self.attn_row_bias, cv, mask, deterministic
        )

        # Col -> Row direction: columns receive from rows (edge transposed).
        c_dst = jnp.einsum("bnhd,hd->bnh", cp, self.attn_col[:, 0])
        c_src = jnp.einsum("bnhd,hd->bnh", rp, self.attn_col[:, 1])
        c_edge = jnp.einsum("bijhd,hd->bjih", e_heads, self.attn_col[:, 2])
        col_message = self._attention(
            c_src, c_dst, c_edge, self.attn_col_bias, rv, mask, deterministic
        )

        ru = self.row_update(jnp.concatenate([row_embed, row_message], axis=-1))
        ru = nn.gelu(ru, approximate=False)
        ru = self.drop(ru, deterministic=deterministic)
        cu = self.col_update(jnp.concatenate([col_embed, col_message], axis=-1))
        cu = nn.gelu(cu, approximate=False)
        cu = self.drop(cu, deterministic=deterministic)

        row_embed = self.row_norm(row_embed + ru)
        col_embed = self.col_norm(col_embed + cu)
        return row_embed, col_embed


class DualGNN(nn.Module):
    """Bipartite dual predictor (dual_gnn.py:146-204).

    __call__(edge_feat (B,n,n,10), row_feat (B,n,14), col_feat (B,n,14),
    mask (B,n)) -> {"u": (B,n), "v_hint": (B,n)} with the reference's gauge:
    u mean-centered, v_hint shifted by +mean(u).
    """

    hidden_dim: int = 128
    layers: int = 4
    heads: int = 4
    dropout: float = 0.1
    remat: bool = False  # rematerialise each layer's activations (for big n)

    @nn.compact
    def __call__(
        self,
        edge_feat: jnp.ndarray,
        row_feat: jnp.ndarray,
        col_feat: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> dict:
        if edge_feat.ndim != 4:
            raise ValueError("edge_feat must be (batch, n, n, F)")
        if self.layers <= 0:
            # reference dual_gnn.py:155-156 — encoder-only output would be
            # near-useless duals surfacing only as a 100% fallback rate.
            raise ValueError("DualGNN requires layers >= 1")

        def encode(x, name):
            h = nn.Dense(self.hidden_dim, name=f"{name}_fc")(x)
            h = nn.gelu(h, approximate=False)
            return nn.LayerNorm(epsilon=1e-5, name=f"{name}_norm")(h)

        row_embed = encode(row_feat, "row_encoder")
        col_embed = encode(col_feat, "col_encoder")

        layer_cls = DualLayer
        if self.remat:
            # Trade FLOPs for memory: recompute each layer's O(n^2 * hidden)
            # edge activations in the backward pass instead of storing them.
            layer_cls = nn.remat(DualLayer, static_argnums=(5,))
        for i in range(self.layers):
            row_embed, col_embed = layer_cls(
                self.hidden_dim, self.heads, self.dropout, name=f"layer_{i}"
            )(edge_feat, row_embed, col_embed, mask, deterministic)

        u = nn.Dense(1, name="row_out")(row_embed)[..., 0]
        v_hint = nn.Dense(1, name="col_out")(col_embed)[..., 0]

        mean_u = jnp.mean(u, axis=-1, keepdims=True)
        u = u - mean_u
        v_hint = v_hint + mean_u  # gauge transfer (dual_gnn.py:193-198)

        if mask is not None:
            u = jnp.where(mask, u, 0.0)
            v_hint = jnp.where(mask, v_hint, 0.0)
        return {"u": u, "v_hint": v_hint}
