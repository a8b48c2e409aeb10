"""Symmetric block-tridiagonal matrices in structured (square-root) form.

This is the numerical core of the framework. The reference implementation
(anindex/stoch_gpmp, ``stoch_gpmp/costs/factors/mp_priors_multi.py:170-202``)
assembles the trajectory prior precision as a *dense* ``M x M`` matrix
(``M = state_dim * traj_len``) and hands it to
``torch.distributions.MultivariateNormal``, which Cholesky-factors it densely —
O(M^3) work on an ill-conditioned matrix that needs float64 to stay positive
definite (reference ``README.md:33-35``). The matrix is in fact
block-tridiagonal by construction; this module exploits that:

- ``BlockTridiag``: blocks ``diag [T, d, d]`` and ``lower [T-1, d, d]``
  (block ``(t+1, t)``). O(T d^2) storage instead of O(T^2 d^2).
- ``cholesky``: O(T d^3) sequential block factorization (``lax.scan``) that
  only ever factors well-conditioned ``d x d`` blocks, so float32 survives
  the extreme sigma ratios the reference needs float64 for.
- ``BlockBidiagChol.solve_L / solve_LT``: O(T d^2) structured triangular
  solves (scans), batched over arbitrary leading axes.
- ``BlockBidiagChol.dense_inv_transpose``: materializes ``W = L^{-T}`` once so
  the per-iteration sampling becomes a single large MXU-friendly matmul
  ``x = mu + eps @ W^T`` instead of a latency-bound sequential scan. Computing
  W uses the stable structured backward substitution; the ill-conditioned
  precision itself is never densely factored.

TPU-first rationale: the hot planner loop wants one big batched matmul per
iteration (MXU), while the *setup* wants numerically-stable small-block math
(VPU / scan). This split delivers both.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import struct
from jax.scipy.linalg import solve_triangular


def _batched_tri_solve(a: jnp.ndarray, b: jnp.ndarray, *, trans: bool) -> jnp.ndarray:
    """Solve ``a y = b`` (or ``a^T y = b``) for lower-triangular ``a [d,d]``
    against a batch ``b [..., d]``. Returns ``[..., d]``."""
    batch_shape = b.shape[:-1]
    d = b.shape[-1]
    bt = b.reshape(-1, d).T  # [d, B]
    if trans:
        y = solve_triangular(a.T, bt, lower=False)
    else:
        y = solve_triangular(a, bt, lower=True)
    return y.T.reshape(*batch_shape, d)


@struct.dataclass
class BlockBidiagChol:
    """Lower block-bidiagonal Cholesky factor ``L`` of a block-tridiagonal SPD
    matrix: ``diag[t]`` is lower-triangular ``d x d``; ``lower[t]`` sits at
    block ``(t+1, t)``."""

    diag: jnp.ndarray  # [T, d, d], each lower-triangular
    lower: jnp.ndarray  # [T-1, d, d]

    @property
    def num_blocks(self) -> int:
        return self.diag.shape[0]

    @property
    def block_dim(self) -> int:
        return self.diag.shape[-1]

    def to_dense(self) -> jnp.ndarray:
        t, d = self.num_blocks, self.block_dim
        m = t * d
        dense = jnp.zeros((m, m), dtype=self.diag.dtype)
        idx = jnp.arange(t)
        dense = _scatter_blocks(dense, self.diag, idx, idx, d)
        if t > 1:
            idx1 = jnp.arange(1, t)
            dense = _scatter_blocks(dense, self.lower, idx1, idx1 - 1, d)
        return dense

    def solve_L(self, b: jnp.ndarray) -> jnp.ndarray:
        """Forward substitution ``L y = b`` for ``b [..., T, d]``."""
        b = jnp.moveaxis(b, -2, 0)  # [T, ..., d]

        def step(y_prev, inp):
            d_t, l_t, b_t = inp
            rhs = b_t - jnp.einsum("ij,...j->...i", l_t, y_prev)
            y_t = _batched_tri_solve(d_t, rhs, trans=False)
            return y_t, y_t

        y0 = _batched_tri_solve(self.diag[0], b[0], trans=False)
        if self.num_blocks == 1:
            return jnp.moveaxis(y0[None], 0, -2)
        _, ys = jax.lax.scan(step, y0, (self.diag[1:], self.lower, b[1:]))
        out = jnp.concatenate([y0[None], ys], axis=0)
        return jnp.moveaxis(out, 0, -2)

    def solve_LT(self, b: jnp.ndarray) -> jnp.ndarray:
        """Backward substitution ``L^T y = b`` for ``b [..., T, d]``."""
        b = jnp.moveaxis(b, -2, 0)  # [T, ..., d]

        def step(y_next, inp):
            d_t, l_next, b_t = inp
            rhs = b_t - jnp.einsum("ji,...j->...i", l_next, y_next)
            y_t = _batched_tri_solve(d_t, rhs, trans=True)
            return y_t, y_t

        y_last = _batched_tri_solve(self.diag[-1], b[-1], trans=True)
        if self.num_blocks == 1:
            return jnp.moveaxis(y_last[None], 0, -2)
        _, ys = jax.lax.scan(
            step,
            y_last,
            (self.diag[:-1], self.lower, b[:-1]),
            reverse=True,
        )
        out = jnp.concatenate([ys, y_last[None]], axis=0)
        return jnp.moveaxis(out, 0, -2)

    def solve(self, b: jnp.ndarray) -> jnp.ndarray:
        """Solve ``(L L^T) x = b`` for ``b [..., T, d]``."""
        return self.solve_LT(self.solve_L(b))

    def logdet(self) -> jnp.ndarray:
        """log-determinant of ``L L^T``."""
        diags = jnp.diagonal(self.diag, axis1=-2, axis2=-1)
        return 2.0 * jnp.sum(jnp.log(diags))

    def dense_inv_transpose(self) -> jnp.ndarray:
        """Materialize ``W = L^{-T}`` as a dense ``[M, M]`` matrix.

        Done once at planner reset; per-iteration sampling is then a single
        batched matmul ``eps @ W^T`` with ``cov(W eps) = (L L^T)^{-1}``.
        """
        t, d = self.num_blocks, self.block_dim
        m = t * d
        eye = jnp.eye(m, dtype=self.diag.dtype).reshape(m, t, d)
        cols = self.solve_LT(eye)  # column j of W solved for basis vector e_j
        return cols.reshape(m, m).T


@struct.dataclass
class BlockTridiag:
    """Symmetric block-tridiagonal matrix: ``diag [T, d, d]`` and
    ``lower [T-1, d, d]`` at block ``(t+1, t)`` (upper blocks are the
    transposes)."""

    diag: jnp.ndarray
    lower: jnp.ndarray

    @property
    def num_blocks(self) -> int:
        return self.diag.shape[0]

    @property
    def block_dim(self) -> int:
        return self.diag.shape[-1]

    def to_dense(self) -> jnp.ndarray:
        t, d = self.num_blocks, self.block_dim
        m = t * d
        dense = jnp.zeros((m, m), dtype=self.diag.dtype)
        idx = jnp.arange(t)
        dense = _scatter_blocks(dense, self.diag, idx, idx, d)
        if t > 1:
            idx1 = jnp.arange(1, t)
            dense = _scatter_blocks(dense, self.lower, idx1, idx1 - 1, d)
            dense = _scatter_blocks(
                dense, jnp.swapaxes(self.lower, -1, -2), idx1 - 1, idx1, d
            )
        return dense

    def matvec(self, x: jnp.ndarray) -> jnp.ndarray:
        """Apply to ``x [..., T, d]`` -> ``[..., T, d]`` in O(T d^2).

        ``out_t = B_t x_t + C_t x_{t-1} + C_{t+1}^T x_{t+1}`` where ``C_t`` is
        the lower block at ``(t, t-1)``.
        """
        out = jnp.einsum("tij,...tj->...ti", self.diag, x)
        if self.num_blocks > 1:
            lo = jnp.einsum("tij,...tj->...ti", self.lower, x[..., :-1, :])
            up = jnp.einsum("tji,...tj->...ti", self.lower, x[..., 1:, :])
            out = out.at[..., 1:, :].add(lo)
            out = out.at[..., :-1, :].add(up)
        return out

    def add_block_diag(self, blocks: jnp.ndarray) -> "BlockTridiag":
        """Add per-step ``[T, d, d]`` (or broadcastable) blocks to the diagonal."""
        return self.replace(diag=self.diag + blocks)

    def add_jitter(self, eps: float) -> "BlockTridiag":
        d = self.block_dim
        return self.replace(diag=self.diag + eps * jnp.eye(d, dtype=self.diag.dtype))

    def cholesky(self) -> BlockBidiagChol:
        """Block Cholesky ``A = L L^T`` via a sequential scan over blocks.

        Per step: ``L_t = C_t D_{t-1}^{-T}``, ``D_t D_t^T = B_t - L_t L_t^T``.
        Only ``d x d`` factorizations — stable in float32 where the dense
        ``M x M`` factorization of the same matrix fails (reference
        ``README.md:33-35``).
        """
        d0 = jnp.linalg.cholesky(self.diag[0])
        if self.num_blocks == 1:
            return BlockBidiagChol(
                diag=d0[None][0:1], lower=jnp.zeros((0,) + self.diag.shape[1:], self.diag.dtype)
            )

        def step(d_prev, inp):
            b_t, c_t = inp
            # L_t = C_t D_prev^{-T}:  solve D_prev y = C_t^T  =>  y^T = C_t D_prev^{-T}
            l_t = solve_triangular(d_prev, c_t.T, lower=True).T
            s_t = b_t - l_t @ l_t.T
            d_t = jnp.linalg.cholesky(s_t)
            return d_t, (d_t, l_t)

        _, (ds, ls) = jax.lax.scan(step, d0, (self.diag[1:], self.lower))
        diag = jnp.concatenate([d0[None], ds], axis=0)
        return BlockBidiagChol(diag=diag, lower=ls)


def _scatter_blocks(dense, blocks, rows, cols, d):
    """Place ``blocks [k, d, d]`` at block coordinates ``(rows, cols)``."""
    t = dense.shape[0] // d
    dense = dense.reshape(t, d, t, d)
    dense = dense.at[rows, :, cols, :].set(blocks)
    return dense.reshape(t * d, t * d)
