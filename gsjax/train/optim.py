"""Optimizer: Adam with per-parameter-group learning rates.

Reproduces the reference's six Adam param groups with ``eps = 1e-15``
(reference: scene/gaussian_model.py:149-167): xyz on the Plenoxels
exponential-decay schedule scaled by the scene radius, f_rest at
feature_lr / 20, the rest at fixed rates. Implemented as
``optax.scale_by_adam`` followed by a per-leaf learning-rate transform, so
densification can edit the Adam moments (``mu`` / ``nu`` pytrees) in place —
the functional form of the reference's optimizer-state surgery.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import optax

from gsjax.utils.schedules import expon_lr_schedule


class GroupLrState(NamedTuple):
    count: jnp.ndarray


def scale_by_group_lr(lr_fns):
    """Per-leaf lr: ``lr_fns`` maps param name -> (step -> lr)."""

    def init(params):
        del params
        return GroupLrState(count=jnp.zeros([], jnp.int32))

    def update(updates, state, params=None):
        del params
        step = state.count + 1  # reference iterations start at 1
        scaled = {
            name: updates[name] * lr_fns[name](step) for name in updates
        }
        return scaled, GroupLrState(count=state.count + 1)

    return optax.GradientTransformation(init, update)


def make_optimizer(opt_cfg, spatial_lr_scale: float):
    """Build the training optimizer for a Gaussian parameter dict.

    ``opt_cfg`` carries the reference's OptimizationParams fields
    (arguments/__init__.py:71-90).
    """
    xyz_sched = expon_lr_schedule(
        lr_init=opt_cfg.position_lr_init * spatial_lr_scale,
        lr_final=opt_cfg.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt_cfg.position_lr_delay_mult,
        max_steps=opt_cfg.position_lr_max_steps,
    )
    lr_fns = {
        "xyz": xyz_sched,
        "features_dc": lambda _: opt_cfg.feature_lr,
        "features_rest": lambda _: opt_cfg.feature_lr / 20.0,
        "opacity": lambda _: opt_cfg.opacity_lr,
        "scaling": lambda _: opt_cfg.scaling_lr,
        "rotation": lambda _: opt_cfg.rotation_lr,
    }
    return optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-15),
        scale_by_group_lr(lr_fns),
        optax.scale(-1.0),
    )


def adam_moments(opt_state):
    """Extract the (mu, nu) pytrees from the chained optimizer state."""
    adam = opt_state[0]
    return adam.mu, adam.nu


def with_adam_moments(opt_state, mu, nu):
    """Return opt_state with replaced Adam moments (after densification)."""
    adam = opt_state[0]._replace(mu=mu, nu=nu)
    return (adam,) + tuple(opt_state[1:])
