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

    def matvec_planes(self, planes):
        """``matvec`` on per-dim time planes (tuple_d of ``[..., T]``) —
        elementwise multiplies + time shifts only, avoiding both the
        d-minor-dim tile padding and batched tiny d x d matmuls."""
        d = self.block_dim
        t = self.num_blocks
        out = []
        for i in range(d):
            acc = None
            for j in range(d):
                term = self.diag[:, i, j] * planes[j]
                acc = term if acc is None else acc + term
            if t > 1:
                lo = None
                up = None
                for j in range(d):
                    tl = self.lower[:, i, j] * planes[j][..., :-1]
                    tu = self.lower[:, j, i] * planes[j][..., 1:]
                    lo = tl if lo is None else lo + tl
                    up = tu if up is None else up + tu
                zero = jnp.zeros_like(lo[..., :1])
                acc = acc + jnp.concatenate([zero, lo], axis=-1)
                acc = acc + jnp.concatenate([up, zero], axis=-1)
            out.append(acc)
        return tuple(out)

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


# --------------------------------------------------------------------------- #
# Parallel-in-time triangular solves (associative scan over the horizon)
# --------------------------------------------------------------------------- #


def _affine_assoc_scan(a_planes, c_planes, d):
    """Prefix-compose the affine recurrence ``y_t = A_t y_{t-1} + c_t`` over
    the LAST axis of the ``[.., T]``-shaped planes via
    ``jax.lax.associative_scan`` — O(log T) depth instead of a T-step scan.

    ``a_planes``: tuple of d*d arrays ``[1, T]`` (entry (i, j) at i*d+j;
    batch-independent). ``c_planes``: tuple of d arrays ``[B, T]``. With
    ``A_0 = 0`` the t-th prefix's offset IS the solution ``y_t``.

    The combine — composition ``(A2, c2) . (A1, c1) = (A2 A1, A2 c1 + c2)``
    — is unrolled into elementwise plane multiplies: a ``[.., T, d, d]``
    matmul-based scan would put the d-wide dims minor on TPU tiles (8-42x
    padding) and dispatch batched tiny matmuls (the known MXU trap); planes
    keep every op a full-width VPU elementwise op.
    """

    def combine(e1, e2):
        a1, c1 = e1
        a2, c2 = e2
        a = tuple(
            sum(a2[i * d + k] * a1[k * d + j] for k in range(d))
            for i in range(d)
            for j in range(d)
        )
        c = tuple(
            sum(a2[i * d + k] * c1[k] for k in range(d)) + c2[i]
            for i in range(d)
        )
        return (a, c)

    # associative_scan canonicalizes ``axis`` against the FIRST leaf's rank
    # and then requires every leaf to share that dimension — give the
    # batch-independent transition planes matching rank (leading 1s keep
    # them broadcast-cheap; they are never tiled out to the batch)
    ndim = c_planes[0].ndim
    a_planes = tuple(p.reshape((1,) * (ndim - 1) + p.shape[-1:]) for p in a_planes)
    _, out_c = jax.lax.associative_scan(combine, (a_planes, c_planes), axis=-1)
    return out_c


@struct.dataclass
class ParallelBidiagSolver:
    """Parallel-in-time (sequence-parallel) solves for a ``BlockBidiagChol``.

    The sequential ``solve_L``/``solve_LT`` scans are affine recurrences
    ``y_t = A_t y_{t∓1} + D_t^{-(T)} b_t`` whose transition matrices depend
    only on the factor — precomputed here once — so each solve becomes an
    associative scan of affine-map compositions: O(log T) depth, all
    elementwise plane math (see ``_affine_assoc_scan``). This is the
    "long-context" axis of the framework (SURVEY.md §5): the reference pays
    O(T^3) dense Cholesky per iteration, the sequential structured path
    O(T) depth, this path O(log T).
    """

    dinv: jnp.ndarray  # [T, d, d] = D_t^{-1} (lower-triangular)
    a_fwd: jnp.ndarray  # [T, d, d]: A_0 = 0, A_t = -D_t^{-1} L_t
    a_bwd: jnp.ndarray  # [T, d, d]: A_{T-1} = 0, A_t = -D_t^{-T} L_{t+1}^T

    @property
    def num_blocks(self) -> int:
        return self.dinv.shape[0]

    @property
    def block_dim(self) -> int:
        return self.dinv.shape[-1]

    @classmethod
    def from_chol(cls, chol: BlockBidiagChol) -> "ParallelBidiagSolver":
        d = chol.block_dim
        eye = jnp.eye(d, dtype=chol.diag.dtype)
        dinv = jax.vmap(lambda m: solve_triangular(m, eye, lower=True))(chol.diag)
        zero = jnp.zeros((1, d, d), dtype=chol.diag.dtype)
        if chol.num_blocks == 1:
            return cls(dinv=dinv, a_fwd=zero, a_bwd=zero)
        a_fwd = jnp.concatenate(
            [zero, -jnp.einsum("tij,tjk->tik", dinv[1:], chol.lower)], axis=0
        )
        a_bwd = jnp.concatenate(
            [-jnp.einsum("tji,tkj->tik", dinv[:-1], chol.lower), zero], axis=0
        )
        return cls(dinv=dinv, a_fwd=a_fwd, a_bwd=a_bwd)

    # ------------------------------------------------------------------ #
    def _planes(self, b):
        """``b [..., T, d]`` -> (batch_shape, tuple_d of ``[B, T]``)."""
        batch_shape = b.shape[:-2]
        t, d = b.shape[-2], b.shape[-1]
        flat = b.reshape(-1, t, d)
        return batch_shape, tuple(flat[..., i] for i in range(d))

    def _unplanes(self, planes, batch_shape):
        t = planes[0].shape[-1]
        out = jnp.stack(planes, axis=-1)  # [B, T, d]
        return out.reshape(*batch_shape, t, self.block_dim)

    def _apply_tri(self, mats, planes, *, trans):
        """Planes of ``D_t^{-1} b_t`` (or transposed) — unrolled, skipping
        the triangle of structural zeros."""
        d = self.block_dim
        out = []
        for i in range(d):
            acc = None
            for j in range(d):
                lo, hi = (j, i) if trans else (i, j)
                if lo < hi:  # upper triangle of a lower-triangular matrix
                    continue
                term = mats[:, lo, hi] * planes[j]
                acc = term if acc is None else acc + term
            out.append(acc)
        return tuple(out)

    def _a_planes(self, a):
        d = self.block_dim
        return tuple(a[:, i, j] for i in range(d) for j in range(d))

    # --- plane-native API: tuple_d of ``[..., T]`` in and out ----------- #
    @staticmethod
    def _flatten_batch(planes):
        """``[..., T]`` -> ``[B, T]`` (row-major leading-dim collapse is
        layout-preserving). Rank>2 plane leaves measured ~11x slower through
        ``associative_scan`` on TPU; always scan in 2D."""
        shape = planes[0].shape
        return tuple(p.reshape(-1, shape[-1]) for p in planes), shape

    def solve_L_planes(self, planes):
        """Forward substitution on per-dim time planes (no ``[.., T, d]``
        materialization — that layout pads its d-wide minor dim up to 32x
        on TPU tiles)."""
        planes, shape = self._flatten_batch(planes)
        c = self._apply_tri(self.dinv, planes, trans=False)
        y = _affine_assoc_scan(self._a_planes(self.a_fwd), c, self.block_dim)
        return tuple(p.reshape(shape) for p in y)

    def solve_LT_planes(self, planes):
        """Backward substitution on per-dim time planes (the sampling hot
        path); reversed time turns it into a forward recurrence."""
        planes, shape = self._flatten_batch(planes)
        c = self._apply_tri(self.dinv, planes, trans=True)
        c_rev = tuple(jnp.flip(p, axis=-1) for p in c)
        a_rev = tuple(jnp.flip(p, axis=-1) for p in self._a_planes(self.a_bwd))
        y_rev = _affine_assoc_scan(a_rev, c_rev, self.block_dim)
        return tuple(jnp.flip(p, axis=-1).reshape(shape) for p in y_rev)

    def solve_L(self, b: jnp.ndarray) -> jnp.ndarray:
        """Forward substitution ``L y = b``, parallel in time."""
        batch_shape, b_planes = self._planes(b)
        return self._unplanes(self.solve_L_planes(b_planes), batch_shape)

    def solve_LT(self, b: jnp.ndarray) -> jnp.ndarray:
        """Backward substitution ``L^T y = b``, parallel in time (the
        sampling hot path: ``x = mu + L^{-T} eps``)."""
        batch_shape, b_planes = self._planes(b)
        return self._unplanes(self.solve_LT_planes(b_planes), batch_shape)

    def solve(self, b: jnp.ndarray) -> jnp.ndarray:
        return self.solve_LT(self.solve_L(b))
