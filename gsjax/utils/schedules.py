"""Learning-rate schedules.

:func:`expon_lr_schedule` reproduces the Plenoxels/JaxNeRF log-lerp decay with
a sine delay ramp used by the reference for the xyz learning rate
(reference: utils/general_utils.py:29-62, scene/gaussian_model.py:164-175) —
but as a jnp-traceable function usable as an optax schedule.
"""

from __future__ import annotations

import math

import jax.numpy as jnp


def expon_lr_schedule(
    lr_init, lr_final, lr_delay_steps=0, lr_delay_mult=1.0, max_steps=1_000_000
):
    """Return ``f(step) -> lr`` with log-linear interpolation lr_init→lr_final.

    ``step`` may be a traced int/float. Returns 0 for negative steps or when
    both endpoints are 0 (parameter disabled), matching the reference helper.
    """
    if lr_init == 0.0 and lr_final == 0.0:
        return lambda step: jnp.zeros_like(jnp.asarray(step, jnp.float32))

    log_init = math.log(lr_init)
    log_final = math.log(lr_final)

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if lr_delay_steps > 0:
            delay = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
                0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0.0, 1.0)
            )
        else:
            delay = 1.0
        t = jnp.clip(step / max_steps, 0.0, 1.0)
        lr = jnp.exp(log_init * (1 - t) + log_final * t)
        return jnp.where(step < 0, 0.0, delay * lr)

    return schedule
