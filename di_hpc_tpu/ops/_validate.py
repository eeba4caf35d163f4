"""Trace-time input validation for the public op functions.

SURVEY.md §5.3: the reference guards inputs with CHECK_INPUT
contiguity/device macros (include/hpc/rll/cuda/status.h:15-17); the
TPU-native equivalent is shape/dtype checks at the API layer.  All checks
here compare Python ints from ShapedArray avals, so under jit they run at
TRACE TIME only (zero runtime cost) and turn a cryptic XLA broadcast error
into an op-named ValueError at the call site.

Only RELATIVE shape relations are asserted: vmap strips the mapped axis from
the tracer shapes uniformly, so vmapped calls (e.g. the R2D2 example's
per-window vmap) keep satisfying them.  Exception: check_nstep pins absolute
ranks (q must be exactly q_ndim-D) because the nstep ops' batch/action axes
are positional — vmapping those ops over an extra leading axis is not
supported (vmap the wrapped call as the R2D2 example does instead).
"""

from __future__ import annotations

import jax.numpy as jnp


def _fail(op: str, msg: str):
    raise ValueError(f"{op}: {msg}")


def _is_int(x) -> bool:
    return jnp.issubdtype(jnp.asarray(x).dtype, jnp.integer)


def check_time_batch(op: str, value, reward, weight=None,
                     value_name: str = "value", reward_name: str = "reward"):
    """value (T+1, *B) against reward (T, *B); optional weight (T, *B)/(*B)."""
    if value.ndim != reward.ndim or value.ndim < 1:
        _fail(op, f"{value_name} must be (T+1, B) and {reward_name} (T, B); "
                  f"got {value.shape} and {reward.shape}")
    if (value.shape[0] != reward.shape[0] + 1
            or value.shape[1:] != reward.shape[1:]):
        _fail(op, f"{value_name} must have shape (T+1, B) = "
                  f"({reward.shape[0] + 1}, {', '.join(map(str, reward.shape[1:]))})"
                  f" to match {reward_name} {reward.shape}; got {value.shape}")
    if weight is not None and tuple(weight.shape) not in (
            tuple(reward.shape), tuple(reward.shape[1:])):
        _fail(op, f"weight must have shape {reward.shape} or "
                  f"{reward.shape[1:]}; got {weight.shape}")


def check_categorical(op: str, logits, action, name: str = "logits"):
    """logits (*R, N) against int action (*R)."""
    if logits.ndim < 1 or logits.shape[:-1] != action.shape:
        _fail(op, f"{name} must be action.shape + (N,); got {name} "
                  f"{logits.shape} for action {action.shape}")
    if not _is_int(action):
        _fail(op, f"action must be an integer array; got dtype "
                  f"{jnp.asarray(action).dtype}")


def check_vtrace(op, target_output, behaviour_output, action, value, reward,
                 weight):
    if behaviour_output.shape != target_output.shape:
        _fail(op, f"behaviour_output {behaviour_output.shape} must match "
                  f"target_output {target_output.shape}")
    check_categorical(op, target_output, action, "target_output")
    if reward.shape != target_output.shape[:-1]:
        _fail(op, f"reward must have shape {target_output.shape[:-1]}; "
                  f"got {reward.shape}")
    check_time_batch(op, value, reward, weight)


def check_upgo(op, target_output, rhos, action, rewards, bootstrap_values):
    check_categorical(op, target_output, action, "target_output")
    for nm, x in (("rhos", rhos), ("rewards", rewards)):
        if x.shape != target_output.shape[:-1]:
            _fail(op, f"{nm} must have shape {target_output.shape[:-1]}; "
                      f"got {x.shape}")
    check_time_batch(op, bootstrap_values, rewards, None, "bootstrap_values",
                     "rewards")


def check_ppo(op, logit_new, logit_old, action, value_new, value_old, adv,
              return_, weight):
    if logit_old.shape != logit_new.shape:
        _fail(op, f"logit_old {logit_old.shape} must match logit_new "
                  f"{logit_new.shape}")
    check_categorical(op, logit_new, action, "logit_new")
    B = logit_new.shape[:-1]
    for nm, x in (("value_new", value_new), ("value_old", value_old),
                  ("adv", adv), ("return_", return_)):
        if x.shape != B:
            _fail(op, f"{nm} must have shape {B}; got {x.shape}")
    if weight is not None and weight.shape != B:
        _fail(op, f"weight must have shape {B}; got {weight.shape}")


def check_ppo_fast(op, logit_new, logp_old, action, value_new, value_old,
                   adv, return_, weight):
    check_categorical(op, logit_new, action, "logit_new")
    B = logit_new.shape[:-1]
    for nm, x in (("logp_old", logp_old), ("value_new", value_new),
                  ("value_old", value_old), ("adv", adv),
                  ("return_", return_)):
        if x.shape != B:
            _fail(op, f"{nm} must have shape {B}; got {x.shape}")
    if weight is not None and weight.shape != B:
        _fail(op, f"weight must have shape {B}; got {weight.shape}")


def check_nstep(op, q, next_n_q, action, next_n_action, reward, done, weight,
                nstep: int, q_ndim: int = 2, batch_axis: int = 0,
                allow_col_weight: bool = False):
    """n-step TD family; batch_axis selects B in q (IQN's layout is
    (tau, B, N), the others are batch-leading).  allow_col_weight admits a
    (B, 1) weight — ONLY for consumers that handle the column shape
    explicitly (dist_nstep expands 1-D weight itself); everywhere else a
    (B, 1) weight would outer-broadcast against the (B,) per-sample errors
    and silently corrupt the mean."""
    if q.ndim != q_ndim:
        _fail(op, f"q must be {q_ndim}-D; got {q.shape}")
    if next_n_q.ndim != q.ndim:
        _fail(op, f"next_n_q must match q's rank; got {next_n_q.shape} vs "
                  f"q {q.shape}")
    B = q.shape[batch_axis]
    for nm, x in (("action", action), ("next_n_action", next_n_action)):
        if x.shape != (B,):
            _fail(op, f"{nm} must have shape ({B},); got {x.shape}")
        if not _is_int(x):
            _fail(op, f"{nm} must be an integer array; got "
                      f"{jnp.asarray(x).dtype}")
    if reward.shape != (nstep, B):
        _fail(op, f"reward must have shape (nstep, B) = ({nstep}, {B}); "
                  f"got {reward.shape}")
    if done.shape != (B,):
        _fail(op, f"done must have shape ({B},); got {done.shape}")
    ok_weight = ((B,), (B, 1)) if allow_col_weight else ((B,),)
    if weight is not None and tuple(weight.shape) not in ok_weight:
        accepted = " or ".join(str(s) for s in ok_weight)
        _fail(op, f"weight must have shape {accepted}; got {weight.shape}")
