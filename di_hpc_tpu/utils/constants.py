"""Framework-wide numeric constants.

The reference scatters these through kernel headers (see
/root/reference/include/hpc/rll/cuda/common.h:44-50 and hard-coded values in
individual kernels); here they live in one module so every op and test agrees.
"""

# LayerNorm epsilon (reference: EPSILON=1e-5, common.h:50; torch.nn.LayerNorm default).
LAYERNORM_EPS = 1e-5

# Value-rescale epsilon for h(x)/h^-1(x) (reference: hard-coded 1e-2 in
# q_nstep_td_rescale_kernel.h:27 and origin/td.py:9-22 default).
VALUE_RESCALE_EPS = 1e-2

# Masked-attention constants for models.pre_sample (reference: hard-coded in
# src/models/actor_critic.cu:77-78).
PRE_SAMPLE_MASK_VALUE = -1e9
PRE_SAMPLE_DIV_FACTOR = 0.8

# Default Huber threshold for quantile-regression losses.
DEFAULT_KAPPA = 1.0
