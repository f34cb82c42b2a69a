"""Dump diffusers DDPMScheduler goldens for ops/schedulers.py parity.

Run this ON A MACHINE WITH ``diffusers`` INSTALLED (it is absent from the
TPU image) and copy the resulting ``.npz`` to
``tests/golden/ddpm_scheduler_golden.npz``; tests/test_schedulers_golden.py
will then verify our JAX schedulers against diffusers' literal outputs
(reference scheduler configs: diffusion_model.py:51-60 — ``scaled_linear``
and ``squaredcos_cap_v2``, both ``prediction_type="sample"``).

    python -m act3d_tpu.convert.golden_scheduler --out ddpm_scheduler_golden.npz

The dump covers, per schedule and per T in (10, 100):
  - betas / alphas_cumprod tables
  - posterior variance at every t (scheduler._get_variance)
  - add_noise outputs on a fixed probe
  - step() outputs at every t on fixed (model_output, sample) probes with
    the variance noise recorded (recovered via the seeded generator).
"""

from __future__ import annotations

import argparse

import numpy as np

SCHEDULES = ("scaled_linear", "squaredcos_cap_v2")
TIMESTEPS = (10, 100)
PROBE_SHAPE = (2, 5, 3)


def make_probes(seed: int = 0):
    rng = np.random.default_rng(seed)
    return {
        "x0": rng.normal(size=PROBE_SHAPE).astype(np.float32) * 1.5,
        "xt": rng.normal(size=PROBE_SHAPE).astype(np.float32),
        "eps": rng.normal(size=PROBE_SHAPE).astype(np.float32),
    }


def dump(out_path: str):
    import torch
    from diffusers import DDPMScheduler
    from diffusers.utils.torch_utils import randn_tensor

    probes = make_probes()
    arrays = {k: v for k, v in probes.items()}
    for schedule in SCHEDULES:
        for T in TIMESTEPS:
            key = f"{schedule}_T{T}"
            sched = DDPMScheduler(
                num_train_timesteps=T,
                beta_schedule=schedule,
                prediction_type="sample",
            )
            sched.set_timesteps(T)
            arrays[f"{key}_betas"] = sched.betas.numpy()
            arrays[f"{key}_alphas_cumprod"] = sched.alphas_cumprod.numpy()
            arrays[f"{key}_variance"] = np.array(
                [float(sched._get_variance(t)) for t in range(T)], np.float64
            )

            ts = np.arange(T, dtype=np.int64)
            x0 = torch.tensor(probes["x0"][:1]).expand(T, *PROBE_SHAPE[1:])
            eps = torch.tensor(probes["eps"][:1]).expand(T, *PROBE_SHAPE[1:])
            arrays[f"{key}_add_noise"] = sched.add_noise(
                x0, eps, torch.tensor(ts)
            ).numpy()

            prevs, noises = [], []
            for t in range(T):
                gen = torch.Generator().manual_seed(1234 + t)
                # recover the exact variance noise diffusers will draw
                noise_gen = torch.Generator().manual_seed(1234 + t)
                noise = randn_tensor(
                    torch.Size((1,) + PROBE_SHAPE[1:]),
                    generator=noise_gen,
                    dtype=torch.float32,
                )
                prev = sched.step(
                    torch.tensor(probes["x0"][:1]),
                    t,
                    torch.tensor(probes["xt"][:1]),
                    generator=gen,
                ).prev_sample
                prevs.append(prev.numpy()[0])
                noises.append(noise.numpy()[0])
            arrays[f"{key}_step_prev"] = np.stack(prevs)
            arrays[f"{key}_step_noise"] = np.stack(noises)

    np.savez(out_path, **arrays)
    print(f"wrote {out_path} ({len(arrays)} arrays)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="ddpm_scheduler_golden.npz")
    dump(p.parse_args().out)
