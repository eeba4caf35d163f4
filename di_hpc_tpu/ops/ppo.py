"""Fused PPO loss (TPU-native).

The reference hand-fuses categorical log-prob/entropy + surrogate clipping +
value clip + monitor stats + grad stashes into two CUDA kernels
(include/hpc/rll/cuda/rl_utils/ppo_kernel.h:12-242).  On TPU the whole loss is
elementwise + row-softmax: a single jit compiles it to a couple of fused VPU
kernels, and JAX autodiff reproduces the hand-derived backward (including the
dual-clip subgradient choices, which follow from min/max subgradients).
"""

from __future__ import annotations

import functools

import jax

from di_hpc_tpu.origin.ppo import ppo_data, ppo_error as _ppo_error, ppo_info, ppo_loss

__all__ = ["ppo_error", "ppo_data", "ppo_loss", "ppo_info", "PPO"]

ppo_error = jax.jit(
    _ppo_error, static_argnames=("clip_ratio", "use_value_clip", "dual_clip")
)


class PPO:
    """Shape-static wrapper mirroring hpc_rll/rl_utils/ppo.py:12-148.

    The reference encodes dual_clip=None as a 0.0 sentinel for the kernel
    (rl_utils/ppo.py:136-137); here None is handled natively as a static
    branch at trace time.
    """

    def __init__(self, B: int, N: int):
        self.B, self.N = B, N

    def __call__(self, logit_new, logit_old, action, value_new, value_old,
                 adv, return_, weight=None, clip_ratio: float = 0.2,
                 use_value_clip: bool = True, dual_clip=None):
        assert logit_new.shape == (self.B, self.N)
        return ppo_error(
            ppo_data(logit_new, logit_old, action, value_new, value_old,
                     adv, return_, weight),
            clip_ratio, use_value_clip, dual_clip,
        )

    forward = __call__
