"""Levenberg-Marquardt on the SE(3)^N x R^{3N} product manifold, fully jitted.

TPU-native replacement for the PyPose optimizer stack used by the reference
(pvgo.py:169-180): ``Cholesky`` solver + ``TrustRegion(radius=1e4)`` strategy
+ ``LM(min=1e-4, vectorize=True)`` + ``StopOnPlateau(steps=10, patience=3,
decreasing=1e-3)``.  Design choices:

- Retraction-based tangent parameterization: pose update Exp(xi) o T (left
  multiplicative), velocity update additive.  Jacobians via ``jax.jacfwd`` of
  the residual at the zero tangent -- one traced program, no per-factor
  hand-derived Jacobians, exact to machine precision.
- Dense normal equations.  The graph is tiny (B=8 -> 81 DoF) and
  chain-structured; a dense Cholesky of the 81x81 Hessian is a single fused
  MXU op, far faster on TPU than exploiting block-tridiagonal sparsity at
  this size.
- The optimization loop is a ``lax.while_loop`` with trust-region
  accept/reject and plateau stopping, so the whole solve (and everything
  around it) compiles to ONE XLA program with zero host round-trips.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from islam_tpu import lie


class LMConfig(NamedTuple):
    radius: float = 1e4          # initial trust-region radius (pvgo.py:170)
    damping_min: float = 1e-4    # diagonal clamp floor (pvgo.py:171 `min`)
    damping_max: float = 1e32
    max_steps: int = 10          # StopOnPlateau steps (pvgo.py:172)
    patience: int = 3            # StopOnPlateau patience
    decreasing: float = 1e-3     # StopOnPlateau relative-decrease threshold
    radius_up: float = 2.0
    radius_down: float = 0.25
    radius_max: float = 1e16
    radius_min: float = 1e-8


def lm_solve_manifold(residual_fn: Callable[[jax.Array, jax.Array], jax.Array],
                      nodes0: jax.Array, vels0: jax.Array,
                      config: LMConfig = LMConfig()):
    """Minimize ||residual_fn(nodes, vels)||^2 over SE3 nodes + velocities.

    Args:
        residual_fn: (nodes (N,7), vels (N,3)) -> flat WEIGHTED residual (R,).
        nodes0 / vels0: initial values (treated as constants; callers
            stop-gradient their inputs to mirror pvgo.py:146-168).

    Returns:
        (nodes, vels, final_cost, steps_taken)
    """
    N = nodes0.shape[0]
    D = 6 * N + 3 * N

    nodes0 = jax.lax.stop_gradient(nodes0)
    vels0 = jax.lax.stop_gradient(vels0)

    def apply_delta(nodes, vels, delta):
        xi = delta[: 6 * N].reshape(N, 6)
        dv = delta[6 * N:].reshape(N, 3)
        return lie.se3_retract(nodes, xi), vels + dv

    def res_at(nodes, vels, delta):
        n2, v2 = apply_delta(nodes, vels, delta)
        return residual_fn(n2, v2)

    def cost_of(r):
        return jnp.sum(r * r)

    zero = jnp.zeros((D,), dtype=vels0.dtype)
    r0 = residual_fn(nodes0, vels0)

    def body(state):
        nodes, vels, radius, cost, plateau, step, _ = state
        # Jacobian of the residual w.r.t. the tangent at zero.
        J = jax.jacfwd(lambda d: res_at(nodes, vels, d))(zero)  # (R, D)
        r = residual_fn(nodes, vels)
        H = J.T @ J
        g = J.T @ r
        diag = jnp.clip(jnp.diagonal(H), config.damping_min, config.damping_max)
        A = H + jnp.diag(diag) / radius
        # Cholesky solve of the damped normal equations.
        L = jnp.linalg.cholesky(A + 1e-10 * jnp.eye(D, dtype=A.dtype))
        delta = -jax.scipy.linalg.cho_solve((L, True), g)

        new_nodes, new_vels = apply_delta(nodes, vels, delta)
        new_r = residual_fn(new_nodes, new_vels)
        new_cost = cost_of(new_r)

        accept = new_cost <= cost
        nodes = jnp.where(accept, new_nodes, nodes)
        vels = jnp.where(accept, new_vels, vels)
        radius = jnp.where(accept,
                           jnp.minimum(radius * config.radius_up,
                                       config.radius_max),
                           jnp.maximum(radius * config.radius_down,
                                       config.radius_min))
        out_cost = jnp.where(accept, new_cost, cost)
        # Plateau: relative decrease below threshold counts toward patience.
        rel_dec = (cost - out_cost) / jnp.maximum(cost, 1e-12)
        plateau = jnp.where(rel_dec < config.decreasing, plateau + 1, 0)
        return (nodes, vels, radius, out_cost, plateau, step + 1, accept)

    def cond(state):
        _, _, _, _, plateau, step, _ = state
        return jnp.logical_and(step < config.max_steps,
                               plateau < config.patience)

    init = (nodes0, vels0,
            jnp.asarray(config.radius, vels0.dtype),
            cost_of(r0),
            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32),
            jnp.asarray(True))
    nodes, vels, _, cost, _, steps, _ = jax.lax.while_loop(cond, body, init)
    return nodes, vels, cost, steps


def lm_solve_unrolled(residual_fn, nodes0, vels0,
                      iters: int = 5, config: LMConfig = LMConfig()):
    """Reverse-differentiable fixed-iteration damped Gauss-Newton.

    The unrolled bi-level alternative (cf. the reference's dead-code
    vo_loss_unroll, pvgo.py:81-92): a ``lax.scan`` over ``iters`` GN steps
    with constant damping, every op differentiable, so upper-level gradients
    flow through the whole optimization path.
    """
    N = nodes0.shape[0]
    D = 9 * N

    def apply_delta(nodes, vels, delta):
        xi = delta[: 6 * N].reshape(N, 6)
        dv = delta[6 * N:].reshape(N, 3)
        return lie.se3_retract(nodes, xi), vels + dv

    damping = 1.0 / config.radius

    def step(carry, _):
        nodes, vels = carry
        zero = jnp.zeros((D,), vels.dtype)
        J = jax.jacfwd(
            lambda d: residual_fn(*apply_delta(nodes, vels, d)))(zero)
        r = residual_fn(nodes, vels)
        H = J.T @ J
        diag = jnp.clip(jnp.diagonal(H), config.damping_min,
                        config.damping_max)
        A = H + jnp.diag(diag) * damping + 1e-9 * jnp.eye(D, dtype=H.dtype)
        delta = -jnp.linalg.solve(A, J.T @ r)
        return apply_delta(nodes, vels, delta), None

    (nodes, vels), _ = jax.lax.scan(step, (nodes0, vels0), None,
                                    length=iters)
    return nodes, vels


def lm_solve_implicit(residual_fn_theta, theta, nodes0, vels0,
                      config: LMConfig = LMConfig()):
    """LM solve with IMPLICIT-FUNCTION gradients (the north-star alternative
    to the detached-solution coupling).

    ``residual_fn_theta(nodes, vels, theta) -> (R,)`` must be a pure
    function: every traced value it uses has to arrive via ``theta`` (a
    pytree; int leaves like edge indices get float0 cotangents), because
    custom_vjp functions may not close over tracers.  Forward runs the
    standard (non-differentiable) trust-region LM; the custom VJP applies
    the implicit function theorem at the converged solution x*:

        dL/dtheta = -(dg/dtheta)^T H^{-1} xbar,   g = J^T r,  H = d g / d x

    so gradients flow through the solve without unrolling it.
    """
    sg = jax.lax.stop_gradient

    @jax.custom_vjp
    def solve(theta, nodes0, vels0):
        nodes, vels, _, _ = lm_solve_manifold(
            lambda n, v: residual_fn_theta(n, v, sg(theta)),
            nodes0, vels0, config)
        return nodes, vels

    def fwd(theta, nodes0, vels0):
        nodes, vels = solve(theta, nodes0, vels0)
        return (nodes, vels), (nodes, vels, theta)

    def bwd(res, cotangents):
        nodes, vels, theta = res
        nbar, vbar = cotangents
        N = nodes.shape[0]
        D = 9 * N
        zero = jnp.zeros((D,), vels.dtype)

        def apply_delta(delta):
            xi = delta[: 6 * N].reshape(N, 6)
            dv = delta[6 * N:].reshape(N, 3)
            return lie.se3_retract(nodes, xi), vels + dv

        def g_fn(delta, th):
            def cost(d):
                n2, v2 = apply_delta(d)
                r = residual_fn_theta(n2, v2, th)
                return 0.5 * jnp.sum(r * r)
            return jax.grad(cost)(delta)

        # Full Hessian of the cost in tangent coords at the solution.
        H = jax.jacfwd(lambda d: g_fn(d, theta))(zero)
        H = H + 1e-6 * jnp.eye(D, dtype=H.dtype)

        # Map the ambient cotangent to tangent coordinates.
        _, vjp_delta = jax.vjp(apply_delta, zero)
        (dbar,) = vjp_delta((nbar, vbar))

        lam = jnp.linalg.solve(H, dbar)
        _, vjp_th = jax.vjp(lambda th: g_fn(zero, th), theta)
        (theta_bar,) = vjp_th(-lam)
        return (theta_bar, jnp.zeros_like(nodes), jnp.zeros_like(vels))

    solve.defvjp(fwd, bwd)
    return solve(theta, nodes0, vels0)
