"""PVGO driver: build weights, run LM, compute upper-level losses.

TPU-native rebuild of ``run_pvgo`` (pvgo.py:122-205).  The whole function is
jit-compatible (``target`` is static), so it fuses with the VO forward and
the IMU scan into one XLA program in the training step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from islam_tpu import lie
from islam_tpu.lie import SE3, SO3
from islam_tpu.pvgo import graph as G
from islam_tpu.pvgo.lm import LMConfig, lm_solve_manifold


def _as_data(x):
    if isinstance(x, (SE3, SO3)):
        return x.data
    return jnp.asarray(x)


@functools.partial(jax.jit,
                   static_argnames=("target", "radius", "reproj", "bilevel"))
def run_pvgo(init_nodes, init_vels, vo_motions, links, dts,
             imu_drots, imu_dtrans, imu_dvels,
             radius: float = 1e4, loss_weight=(1., 1., 1., 1.),
             reproj=None, target: str = "vo", bilevel: str = "detached"):
    """Solve the pose-velocity graph and return imperative losses.

    Args mirror pvgo.py:122-123: ``init_nodes`` SE3 (B+1,7) initial poses
    (typically the IMU world-mode poses), ``init_vels`` (B+1,3),
    ``vo_motions`` SE3 (E,7) from the front-end (carries gradients),
    ``links`` (E,2) int edges, ``dts`` (M,), ``imu_drots`` SO3 quats (M,4)
    (carries gradients for the imu target), ``imu_dtrans``/``imu_dvels``
    (M,3).  ``loss_weight`` = (vo, imu_vel, imu_rot, transvel) weights; the
    info matrices are diag(w^2) exactly as pvgo.py:125-143.

    Returns (trans_loss, rot_loss, nodes (B+1,7), vels (B+1,3), covs dict).
    Outputs nodes/vels are aligned back to init_nodes[0] (pvgo.py:195) and
    detached; the losses carry gradients to vo_motions or imu inputs only
    (one-step / detached-solution bi-level coupling, SURVEY.md section 3.4).
    """
    init_nodes = _as_data(init_nodes)
    init_vels = jnp.asarray(init_vels)
    vo_motions = _as_data(vo_motions)
    links = jnp.asarray(links)
    dts = jnp.reshape(jnp.asarray(dts), (-1, 1)).astype(init_vels.dtype)
    imu_drots = _as_data(imu_drots)
    imu_dtrans = jnp.asarray(imu_dtrans)
    imu_dvels = jnp.asarray(imu_dvels)

    w = [jnp.asarray(x, init_vels.dtype) for x in loss_weight]

    # Keep grad-carrying copies for the upper-level losses (pvgo.py:147-150).
    vo_motions_grad = vo_motions
    imu_drots_grad = imu_drots
    imu_dvels_grad = imu_dvels

    # Detach everything entering the solver (pvgo.py:146-168).
    sg = jax.lax.stop_gradient
    poses_d = sg(vo_motions)
    drots_d = sg(imu_drots)
    dtrans_d = sg(imu_dtrans)
    dvels_d = sg(imu_dvels)
    dts_d = sg(dts)

    def residual_fn(nodes, vels):
        pgerr, adjvelerr, imuroterr, transvelerr = G.pvgo_residuals(
            nodes, vels, links, poses_d, drots_d, dtrans_d, dvels_d, dts_d)
        # sqrt(info) scaling: info = w^2 -> scale residual by w so that
        # ||r||^2 reproduces r^T diag(w^2) r (pvgo.py:125-143,162).
        blocks = [
            (pgerr * w[0]).reshape(-1),
            (adjvelerr * w[1]).reshape(-1),
            (imuroterr * w[2]).reshape(-1),
            (transvelerr * w[3]).reshape(-1),
        ]
        if reproj is not None:
            # info scaled (w4/N)^2 per keypoint (pvgo.py:130-131); a dense
            # per-frame-mean loss has one residual per edge (N=1)
            rerr = G.reproj_residual(nodes, reproj)
            n_points = max(rerr.shape[1] // 2, 1)
            w4 = (jnp.asarray(loss_weight[4], init_vels.dtype)
                  if len(loss_weight) > 4 else jnp.asarray(1.0))
            blocks.append((rerr * (w4 / n_points)).reshape(-1))
        return jnp.concatenate(blocks)

    cfg = LMConfig(radius=radius)

    if bilevel == "detached":
        # Reference semantics: one-step / detached-solution coupling.
        nodes, vels, final_cost, steps = lm_solve_manifold(
            residual_fn, sg(init_nodes), sg(init_vels), cfg)
        detach_nodes = True
    else:
        # North-star alternatives: gradients flow THROUGH the solve.  All
        # traced values travel inside theta (custom_vjp closure rule).
        theta = {
            "poses": vo_motions_grad, "drots": imu_drots_grad,
            "dtrans": sg(imu_dtrans), "dvels": imu_dvels_grad,
            "links": links, "dts": dts_d,
            "w": jnp.stack([w[0], w[1], w[2], w[3]]),
            # The optional reprojection factor rides inside theta too
            # (the loss objects are pytree-registered for exactly this):
            # round-4 advisor — omitting it made --bilevel implicit +
            # --reproj-points silently solve a DIFFERENT lower-level
            # objective than detached mode.
            "reproj": reproj,
            "w4": (jnp.asarray(loss_weight[4], init_vels.dtype)
                   if len(loss_weight) > 4 else jnp.asarray(1.0)),
        }

        def residual_theta(nodes_, vels_, th):
            pgerr, adjvelerr, imuroterr, transvelerr = G.pvgo_residuals(
                nodes_, vels_, th["links"], th["poses"], th["drots"],
                th["dtrans"], th["dvels"], th["dts"])
            blocks = [
                (pgerr * th["w"][0]).reshape(-1),
                (adjvelerr * th["w"][1]).reshape(-1),
                (imuroterr * th["w"][2]).reshape(-1),
                (transvelerr * th["w"][3]).reshape(-1),
            ]
            if reproj is not None:  # static (presence decides the program)
                rerr = G.reproj_residual(nodes_, th["reproj"])
                n_points = max(rerr.shape[1] // 2, 1)
                blocks.append((rerr * (th["w4"] / n_points)).reshape(-1))
            return jnp.concatenate(blocks)

        if bilevel == "implicit":
            from islam_tpu.pvgo.lm import lm_solve_implicit
            nodes, vels = lm_solve_implicit(
                residual_theta, theta, sg(init_nodes), sg(init_vels), cfg)
        elif bilevel == "unrolled":
            from islam_tpu.pvgo.lm import lm_solve_unrolled
            nodes, vels = lm_solve_unrolled(
                lambda n_, v_: residual_theta(n_, v_, theta),
                sg(init_nodes), sg(init_vels), iters=cfg.max_steps // 2,
                config=cfg)
        else:
            raise ValueError(f"unknown bilevel mode {bilevel}")
        detach_nodes = False

    # Upper-level loss on the converged solution.
    if target == "vo":
        trans_loss, rot_loss = G.vo_loss(nodes, links, vo_motions_grad,
                                         detach_nodes=detach_nodes)
    elif target == "imu":
        trans_loss, rot_loss = G.imu_loss(nodes, vels,
                                          imu_drots_grad, imu_dvels_grad)
    else:
        trans_loss = jnp.zeros(links.shape[0], init_vels.dtype)
        rot_loss = jnp.zeros(links.shape[0], init_vels.dtype)

    # Re-anchor to the original first pose and detach (pvgo.py:195-197).
    nodes, vels = G.align_to(nodes, vels, sg(init_nodes[0]))
    nodes = sg(nodes)
    vels = sg(vels)

    covs = {
        "vo_rot": jnp.full((links.shape[0],), w[0] ** 2),
        "vo_trans": jnp.full((links.shape[0],), w[0] ** 2),
        "imu_rot": jnp.full((init_nodes.shape[0] - 1,), w[2] ** 2),
        "imu_vel": jnp.full((init_nodes.shape[0] - 1,), w[1] ** 2),
        "transvel": jnp.full((init_nodes.shape[0] - 1,), w[3] ** 2),
    }
    if reproj is not None and len(loss_weight) > 4:
        covs["reproj"] = jnp.full(
            (init_nodes.shape[0] - 1,),
            (jnp.asarray(loss_weight[4]) / getattr(reproj, "N", 1)) ** 2)

    return trans_loss, rot_loss, nodes, vels, covs
