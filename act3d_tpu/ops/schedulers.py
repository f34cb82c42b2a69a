"""DDPM noise schedulers in JAX.

Bit-careful re-implementation of the two scheduler configurations the
reference uses (reference: model/trajectory_optimization/diffusion_model.py:51-60):

  * position:  ``beta_schedule="scaled_linear"``, ``prediction_type="sample"``
  * rotation:  ``beta_schedule="squaredcos_cap_v2"``, ``prediction_type="sample"``

Both inherit diffusers' ``DDPMScheduler`` defaults that matter numerically:
``beta_start=1e-4``, ``beta_end=0.02``, ``clip_sample=True`` (range 1.0),
``variance_type="fixed_small"``.  The stepping math is expressed as pure
functions over precomputed coefficient tables so the 100-step reverse loop
compiles to a single ``lax.scan`` on TPU (the reference loops in Python and
re-runs the visual encoder every step — see diffusion_model.py:99-117).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Literal

import jax
import jax.numpy as jnp

__all__ = ["DDPMSchedule", "make_ddpm_schedule"]


def _betas(schedule: str, num_timesteps: int):
    """float64 numpy beta table (cast to f32 only after the posterior
    coefficients are derived — the 1/(1-alphas_cumprod) division near t=0
    amplifies f32 cumprod error ~100x)."""
    import numpy as np

    beta_start, beta_end = 1e-4, 0.02
    if schedule == "linear":
        return np.linspace(beta_start, beta_end, num_timesteps, dtype=np.float64)
    if schedule == "scaled_linear":
        return (
            np.linspace(
                beta_start**0.5, beta_end**0.5, num_timesteps, dtype=np.float64
            )
            ** 2
        )
    if schedule == "squaredcos_cap_v2":
        def alpha_bar(t):
            return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2

        betas = [
            min(1.0 - alpha_bar((i + 1) / num_timesteps) / alpha_bar(i / num_timesteps), 0.999)
            for i in range(num_timesteps)
        ]
        return np.asarray(betas, dtype=np.float64)
    raise ValueError(f"unknown beta schedule {schedule!r}")


@dataclasses.dataclass(frozen=True)
class DDPMSchedule:
    """Precomputed DDPM coefficient tables (all shape (T,))."""

    num_timesteps: int
    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    # x_{t-1} = c0[t] * x0_hat + c1[t] * x_t + sqrt(var[t]) * eps
    posterior_x0_coeff: jnp.ndarray
    posterior_xt_coeff: jnp.ndarray
    posterior_variance: jnp.ndarray
    clip_sample: bool = True
    clip_sample_range: float = 1.0

    def add_noise(
        self, x0: jax.Array, noise: jax.Array, timesteps: jax.Array
    ) -> jax.Array:
        """Forward-process: diffuse clean samples to step t.

        timesteps: integer array broadcastable against x0's batch dims
        (typically (B,)).
        """
        shape = timesteps.shape + (1,) * (x0.ndim - timesteps.ndim)
        a = self.sqrt_alphas_cumprod[timesteps].reshape(shape)
        b = self.sqrt_one_minus_alphas_cumprod[timesteps].reshape(shape)
        return a * x0 + b * noise

    def step(
        self,
        model_output: jax.Array,
        timestep: jax.Array,
        sample: jax.Array,
        noise: jax.Array,
    ) -> jax.Array:
        """One reverse step t -> t-1 for ``prediction_type="sample"``.

        `noise` must be pre-sampled standard normal of sample's shape; it is
        only applied for t > 0 (diffusers adds variance noise unless t == 0).
        """
        x0 = model_output
        if self.clip_sample:
            x0 = jnp.clip(x0, -self.clip_sample_range, self.clip_sample_range)
        c0 = self.posterior_x0_coeff[timestep]
        c1 = self.posterior_xt_coeff[timestep]
        var = self.posterior_variance[timestep]
        prev = c0 * x0 + c1 * sample
        return prev + jnp.where(timestep > 0, jnp.sqrt(var), 0.0) * noise


def make_ddpm_schedule(
    beta_schedule: Literal["linear", "scaled_linear", "squaredcos_cap_v2"],
    num_timesteps: int = 100,
    clip_sample: bool = True,
    clip_sample_range: float = 1.0,
) -> DDPMSchedule:
    import numpy as np

    betas = _betas(beta_schedule, num_timesteps)  # float64
    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas)
    # previous-step cumulative products (alpha_bar_{t-1}, with alpha_bar_{-1}=1)
    alphas_cumprod_prev = np.concatenate([[1.0], alphas_cumprod[:-1]])
    current_alpha = alphas_cumprod / alphas_cumprod_prev  # == alphas
    current_beta = 1.0 - current_alpha
    beta_prod = 1.0 - alphas_cumprod

    posterior_x0_coeff = np.sqrt(alphas_cumprod_prev) * current_beta / beta_prod
    posterior_xt_coeff = np.sqrt(current_alpha) * (1.0 - alphas_cumprod_prev) / beta_prod
    # "fixed_small": beta_t * (1 - abar_{t-1}) / (1 - abar_t), clamped like diffusers
    posterior_variance = np.maximum(
        (1.0 - alphas_cumprod_prev) / beta_prod * current_beta, 1e-20
    )

    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)  # noqa: E731
    return DDPMSchedule(
        num_timesteps=num_timesteps,
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        posterior_x0_coeff=f32(posterior_x0_coeff),
        posterior_xt_coeff=f32(posterior_xt_coeff),
        posterior_variance=f32(posterior_variance),
        clip_sample=clip_sample,
        clip_sample_range=clip_sample_range,
    )
