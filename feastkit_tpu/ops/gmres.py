"""Batched iterative solvers for shifted systems: restarted GMRES, BiCGStab.

TPU-native replacement of the reference's Krylov.jl inner solves
(solve_shifted_iterative!, feast_sparse.jl:164-236; solve_dense_shifted!,
feast_dense.jl:26-67; create_iterative_solver, feast_matfree.jl:668-739):

* all M0 right-hand sides advance together — one operator application per
  Arnoldi step is a single (N, K) block matvec (MXU/BW friendly), with
  per-column Hessenberg data carried in batch;
* reference semantics preserved: rtol = atol = tol, restart memory,
  iteration cap, and the independent residual re-verification at 10*tol
  slack (feast_sparse.jl:191-199);
* CG is intentionally absent: shifted systems (zB - A) are never HPD for
  complex z (create_iterative_solver rejects :cg, feast_matfree.jl:720-726).

The contour-node axis is the caller's: drivers lax.map/vmap these solvers
over nodes with a per-node operator closure.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["gmres_block", "bicgstab_block", "IterativeInfo"]


class IterativeInfo(NamedTuple):
    iterations: jax.Array    # i32: total inner iterations executed
    residual: jax.Array      # (K,) final true-residual norms (absolute)
    converged: jax.Array     # (K,) bool, after 10*tol re-verification


def _col_norms(X, axis_name=None):
    n2 = jnp.real(jnp.einsum("nk,nk->k", jnp.conj(X), X))
    if axis_name is not None:
        n2 = jax.lax.psum(n2, axis_name)
    return jnp.sqrt(n2)


def gmres_block(apply_op: Callable, B, *, tol: float = 1e-12,
                restart: int = 30, maxiter: int = 200,
                apply_prec: Callable | None = None,
                x0=None, flag_tol: float | None = None,
                axis_name: str | None = None,
                sync_axes=None
                ) -> tuple[jax.Array, IterativeInfo]:
    """Restarted GMRES on K right-hand sides at once.

    Args:
      apply_op: (N, K) -> (N, K), applies the (shifted) operator columnwise.
      B: (N, K) right-hand sides.
      tol: relative AND absolute tolerance (rtol=atol, reference contract).
      restart: Arnoldi memory m.
      maxiter: total inner-iteration cap.
      apply_prec: optional RIGHT preconditioner M^-1 as (N, K) -> (N, K);
        solves A M^-1 u = b, returns x = M^-1 u.
      x0: optional initial guess (N, K).
      axis_name: if the row dimension N is SHARDED over a mesh axis inside
        shard_map, the name of that axis — every contraction over N
        (column norms, Arnoldi projections) is psum-reduced across it, so
        the solver runs row-parallel with apply_op handling halo exchange.
      sync_axes: mesh axes whose groups run INDEPENDENT solves that must
        nevertheless execute the same number of loop iterations (e.g. the
        contour axis: each group's shift differs, but apply_op's collectives
        over axis_name are mesh-global, so divergent trip counts deadlock).
        Loop-exit decisions are pmin-synchronized across these axes.

    Returns (X, IterativeInfo). The residual re-verification computes the
    TRUE residual ||B - A X|| and reports converged = res <= 10*tol*scale
    (feast_sparse.jl:191-199 slack).
    """
    N, K = B.shape
    dtype = B.dtype
    m = restart
    prec = apply_prec if apply_prec is not None else (lambda X: X)

    cn = lambda X: _col_norms(X, axis_name)
    b_norm = cn(B)
    scale = jnp.maximum(b_norm, 1.0)      # rtol=atol: threshold on max(|b|,1)
    thresh = tol * scale

    X0 = jnp.zeros_like(B) if x0 is None else x0.astype(dtype)
    n_cycles = max(1, -(-maxiter // m))

    def _alldone(done):
        a = jnp.all(done)
        if sync_axes:
            a = jax.lax.pmin(a.astype(jnp.int32), sync_axes) > 0
        return a

    def cycle(carry):
        X, done, iters, cyc, _, stall = carry
        R = B - apply_op(X)
        beta = cn(R)
        active = (~done) & (beta > thresh)
        safe_beta = jnp.where(beta > 0, beta, 1.0)
        V0 = R / safe_beta[None, :]

        V = jnp.zeros((m + 1, N, K), dtype).at[0].set(V0)
        H = jnp.zeros((m + 1, m, K), dtype)

        def arnoldi(j, carry):
            V, H = carry
            W = apply_op(prec(V[j]))
            # modified Gram-Schmidt against all previous (masked by i <= j)
            idx = jnp.arange(m + 1)
            mask = (idx <= j).astype(dtype)[:, None]
            h = jnp.einsum("ink,nk->ik", jnp.conj(V), W) * mask   # (m+1, K)
            if axis_name is not None:
                h = jax.lax.psum(h, axis_name)
            W = W - jnp.einsum("ink,ik->nk", V, h)
            # one reorthogonalization pass (classical twice ~ stable)
            h2 = jnp.einsum("ink,nk->ik", jnp.conj(V), W) * mask
            if axis_name is not None:
                h2 = jax.lax.psum(h2, axis_name)
            W = W - jnp.einsum("ink,ik->nk", V, h2)
            h = h + h2
            wn = cn(W)
            h_j1 = wn.astype(dtype)
            V = V.at[j + 1].set(W / jnp.where(wn > 0, wn, 1.0)[None, :])
            H = H.at[:, j, :].set(h)
            H = H.at[j + 1, j, :].set(h_j1)
            return V, H

        V, H = jax.lax.fori_loop(0, m, arnoldi, (V, H))

        # Per-column least squares min ||beta e1 - H y||, vmapped over K.
        e1 = jnp.zeros((m + 1,), dtype).at[0].set(1.0)

        def lstsq_col(Hk, bk):
            # (m+1, m) @ y = bk * e1 via normal equations on Q-less small
            # system: use jnp.linalg.lstsq (SVD-based, small).
            y, *_ = jnp.linalg.lstsq(Hk, bk * e1)
            return y

        Y = jax.vmap(lstsq_col, in_axes=(2, 0), out_axes=1)(
            H, beta.astype(dtype))                     # (m, K)
        dX = prec(jnp.einsum("ink,ik->nk", V[:m], Y))
        X_cand = X + dX * active.astype(dtype)[None, :]
        res_cand = cn(B - apply_op(X_cand))
        # accept the cycle's correction PER COLUMN only where it reduced
        # the true residual: at the attainable rounding floor the small
        # least-squares solve is noisy and an unconditional update lets
        # stagnated cycles random-walk X away from the best iterate
        keep = (res_cand < beta) & active
        X_new = jnp.where(keep[None, :], X_cand, X)
        res = jnp.where(keep, res_cand, beta)
        done_new = done | (res <= thresh)
        # stall detection: restarted GMRES at the attainable rounding floor
        # stops improving; burning the remaining restart cycles wastes
        # minutes of wall clock (and trips execution watchdogs) for zero
        # digits. Restarted GMRES routinely stagnates for ONE cycle and
        # recovers (indefinite shifted systems near contour nodes), so a
        # single no-progress cycle must not abort a solve that still has
        # maxiter budget: exit only after TWO CONSECUTIVE cycles in which
        # no unconverged column improved by >= 10%. With sync_axes the loop
        # exits only once EVERY mesh group is done or stalled (divergent
        # trip counts around collectives deadlock).
        improved = res < 0.9 * beta
        stalled = ~jnp.any(improved & ~done_new)
        stall_new = jnp.where(stalled, stall + 1, 0).astype(jnp.int32)
        local_exit = jnp.all(done_new) | (stall_new >= 2)
        if sync_axes:
            local_exit = jax.lax.pmin(local_exit.astype(jnp.int32),
                                      sync_axes) > 0
        return (X_new, done_new, iters + jnp.where(jnp.any(active), m, 0),
                cyc + 1, local_exit, stall_new)

    def cycle_cond(carry):
        _, _, _, cyc, exit_flag, _ = carry
        # early exit once every column converged (a preconditioned solve
        # often finishes in one cycle; running the full maxiter budget
        # anyway wastes restart-fold work and trips execution watchdogs).
        # exit_flag is computed IN THE BODY (mesh-synchronized when
        # sync_axes is set) so the cond itself contains no collectives.
        return (cyc < n_cycles) & ~exit_flag

    init_R = B - apply_op(X0)
    init_done = cn(init_R) <= thresh
    X, done, iters, _, _, _ = jax.lax.while_loop(
        cycle_cond, cycle,
        (X0, init_done, jnp.int32(0), jnp.int32(0), _alldone(init_done),
         jnp.int32(0)))

    # Independent re-verification at 10*tol slack (reference contract,
    # feast_sparse.jl:191-199). flag_tol lets callers certify against a
    # LOOSER accuracy than the solve target (e.g. the outer FEAST tolerance:
    # the solver aims at tol = 0.1*outer but only outer-level inner accuracy
    # is required for the filter; a stall between the two is not a failure).
    cert = jnp.maximum(tol, flag_tol) if flag_tol is not None else tol
    true_res = cn(B - apply_op(X))
    converged = true_res <= 10.0 * cert * scale
    return X, IterativeInfo(iters, true_res, converged)


def bicgstab_block(apply_op: Callable, B, *, tol: float = 1e-12,
                   maxiter: int = 200,
                   apply_prec: Callable | None = None,
                   x0=None, flag_tol: float | None = None,
                   axis_name: str | None = None,
                   sync_axes=None
                   ) -> tuple[jax.Array, IterativeInfo]:
    """BiCGStab on K right-hand sides at once (constant memory per column).

    The IFEAST default inner solver (fpm[44]=0 -> BiCGstab,
    feast_parameters.jl:326-329). Same tolerance / re-verification contract
    as gmres_block.
    """
    N, K = B.shape
    dtype = B.dtype
    prec = apply_prec if apply_prec is not None else (lambda X: X)

    cn = lambda X: _col_norms(X, axis_name)
    b_norm = cn(B)
    scale = jnp.maximum(b_norm, 1.0)
    thresh = tol * scale

    X0 = jnp.zeros_like(B) if x0 is None else x0.astype(dtype)
    R0 = B - apply_op(X0)
    Rhat = R0

    def dots(P, Q):
        d = jnp.einsum("nk,nk->k", jnp.conj(P), Q)
        if axis_name is not None:
            d = jax.lax.psum(d, axis_name)
        return d

    def _alldone(done):
        a = jnp.all(done)
        if sync_axes:
            a = jax.lax.pmin(a.astype(jnp.int32), sync_axes) > 0
        return a

    def step(carry):
        X, R, P, V, rho, alpha, omega, it, done, _ = carry
        rho_new = dots(Rhat, R)
        safe = lambda x: jnp.where(jnp.abs(x) > 0, x, 1.0)
        beta = (rho_new / safe(rho)) * (alpha / safe(omega))
        P = R + beta[None, :] * (P - omega[None, :] * V)
        Ph = prec(P)
        V = apply_op(Ph)
        alpha = rho_new / safe(dots(Rhat, V))
        S = R - alpha[None, :] * V
        Sh = prec(S)
        T = apply_op(Sh)
        omega = dots(T, S) / safe(dots(T, T))
        upd = (~done).astype(dtype)[None, :]
        X = X + (alpha[None, :] * Ph + omega[None, :] * Sh) * upd
        R = S - omega[None, :] * T
        done = done | (cn(R) <= thresh)
        return X, R, P, V, rho_new, alpha, omega, it + 1, done, _alldone(done)

    def cond(carry):
        *_, it, done, all_done = carry
        return (~all_done) & (it < maxiter)

    ones = jnp.ones((K,), dtype)
    done0 = cn(R0) <= thresh
    init = (X0, R0, jnp.zeros_like(B), jnp.zeros_like(B),
            ones, ones, ones, jnp.int32(0), done0, _alldone(done0))
    X, R, *_, it, done, _ = jax.lax.while_loop(cond, step, init)

    cert = jnp.maximum(tol, flag_tol) if flag_tol is not None else tol
    true_res = cn(B - apply_op(X))
    converged = true_res <= 10.0 * cert * scale
    return X, IterativeInfo(it, true_res, converged)
