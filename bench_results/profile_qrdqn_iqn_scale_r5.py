"""r5 (VERDICT ask #4): adjudicate qrdqn/iqn at PRODUCTION replay-learner
scale — tau=64, B=4096, N=64 — where the pairwise (B, tau, tau') huber
tensor is ~16.8M elements and the r4 claim "ops IS jit(origin), no kernel
case" (DESIGN.md §6, proven only at the reference's launch-bound toy
configs) is untested.

Measures fwd and fwd+grad(q) for:
  - the origin oracle as-is (take_along_axis gathers; its grad is an XLA
    scatter — both serialize on TPU per CLAUDE.md lore), and
  - an iota-compare one-hot reformulation of the same math (gather becomes
    where(iota==a, q, 0) sums; its transpose is a fusable where).

Rooflines: min traffic fwd = read q + next_n_q (2 x 67 MB); fwd+grad adds
dq written (67 MB).  The (B, tau, tau') pairwise tensor never needs HBM —
it is a broadcast of (B, tau) row/col vectors that should fuse into its
consuming reductions.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python
bench_results/profile_qrdqn_iqn_scale_r5.py [qrdqn|iqn|all]

MEASURED (r5, v5e; % is of the analytic HBM floor — sessions with a hot
cache read past 100%):

  qrdqn fwd        origin 126.7us (129%)   iota 274.4 ( 60%)
  qrdqn fwd+grad   origin 862.7us ( 29%)   iota 247.1 (100%)
  iqn   fwd        origin 113.7us (144%)   iota 277.1 ( 59%)
  iqn   fwd+grad   origin 613.4us ( 40%)
  ops (hybrid: take_along fwd + iota-compare custom-VJP bwd), later
  sessions with warmer cache states:
  qrdqn fwd 160.8/80.1us   qrdqn fwd+grad 165.3us
  iqn   fwd 40.5us         iqn   fwd+grad 98.5us

Conclusion: forward has no kernel case (jit(origin) at/past floor; the
pairwise tensor fuses), but take_along_axis's scatter transpose serializes
the backward 2.5-3.5x — ops.qrdqn/iqn now use the hybrid gathers
(ops/td.py _gather_taus_axis1/_gather_n_axis2).
"""
import jax
import jax.numpy as jnp

from di_hpc_tpu import ops, origin
from di_hpc_tpu.origin.td import (
    iqn_nstep_td_data, qrdqn_nstep_td_data, _discounted_reward_sum,
)
from di_hpc_tpu.utils.profiling import bench_fn

HBM_GBS = 819.0


def p(name, t, mb=None):
    extra = ""
    if mb is not None:
        floor = mb * 1e6 / (HBM_GBS * 1e3)
        extra = f"  floor {floor:7.1f} us ({100*floor/(t*1e6):5.1f}% SoL)"
    print(f"{name:<40} {t*1e6:9.1f} us{extra}", flush=True)


def onehot_gather_Bdim(q, action):
    """(B, N, tau) gather of action's slice -> (B, tau) without dynamic
    gather: sum over an iota-compare mask (reads q once, fully fusable,
    and its VJP is the same mask — no scatter)."""
    n_iota = jax.lax.broadcasted_iota(jnp.int32, q.shape, 1)
    return jnp.sum(jnp.where(n_iota == action[:, None, None], q, 0.0), axis=1)


def qrdqn_iota(data, gamma, nstep=1):
    q, next_n_q, action, next_n_action, reward, done, tau, weight = data
    B = action.shape[0]
    if weight is None:
        weight = jnp.ones((B,), q.dtype)
    q_s_a = onehot_gather_Bdim(q, action)[:, :, None]            # (B, tau, 1)
    target_q_s_a = jax.lax.stop_gradient(
        onehot_gather_Bdim(next_n_q, next_n_action))[:, None, :]  # (B, 1, tau)
    r = _discounted_reward_sum(reward, gamma)[:, None, None]
    done_f = (1.0 - done.astype(q.dtype))[:, None, None]
    target_q_s_a = r + (gamma ** nstep) * target_q_s_a * done_f
    diff = target_q_s_a - q_s_a
    u = jnp.where(jnp.abs(diff) < 1.0, 0.5 * diff * diff, jnp.abs(diff) - 0.5)
    ind = jax.lax.stop_gradient((diff <= 0.0).astype(q.dtype))
    loss_per_sample = jnp.mean(jnp.sum(u * jnp.abs(tau - ind), axis=-1), axis=1)
    return jnp.mean(loss_per_sample * weight), loss_per_sample


def iqn_iota(data, gamma, nstep=1, kappa=1.0):
    q, next_n_q, action, next_n_action, reward, done, rq_, weight = data
    tau, B, _ = q.shape
    tau_p = next_n_q.shape[0]
    if weight is None:
        weight = jnp.ones((B,), q.dtype)
    # (tau, B, N) gathers along N
    n_iota = jax.lax.broadcasted_iota(jnp.int32, q.shape, 2)
    q_s_a = jnp.sum(jnp.where(n_iota == action[None, :, None], q, 0.0),
                    axis=2).T[:, :, None]                        # (B, tau, 1)
    n_iota2 = jax.lax.broadcasted_iota(jnp.int32, next_n_q.shape, 2)
    tgt = jax.lax.stop_gradient(jnp.sum(
        jnp.where(n_iota2 == next_n_action[None, :, None], next_n_q, 0.0),
        axis=2).T)                                               # (B, tau')
    r = _discounted_reward_sum(reward, gamma)[:, None]
    done_f = (1.0 - done.astype(q.dtype))[:, None]
    tgt = r + (gamma ** nstep) * tgt * done_f
    be = tgt[:, :, None, None] - q_s_a[:, None, :, :]            # (B,tau',tau,1)
    abs_err = jnp.abs(be)
    huber = jnp.where(abs_err <= kappa, 0.5 * be ** 2,
                      kappa * (abs_err - 0.5 * kappa))
    rq = rq_.reshape(tau, B).T[:, None, :, None]
    ind = jax.lax.stop_gradient((be < 0).astype(q.dtype))
    qh = jnp.abs(rq - ind) * huber / kappa
    loss_per_sample = jnp.mean(jnp.sum(qh, axis=2), axis=1)[:, 0]
    return jnp.mean(loss_per_sample * weight), loss_per_sample


def main(which="all"):
    TAU, B, N = 64, 4096, 64
    k = jax.random.split(jax.random.PRNGKey(11), 8)
    MB = B * N * TAU * 4 / 1e6

    # ---- qrdqn (B, N, tau) ----
    if which in ("all", "qrdqn"):
        _qrdqn(TAU, B, N, k, MB)
    if which in ("all", "iqn"):
        _iqn(TAU, B, N, k, MB)


def _qrdqn(TAU, B, N, k, MB):
    q = jax.random.normal(k[0], (B, N, TAU))
    nq = jax.random.normal(k[1], (B, N, TAU))
    act = jax.random.randint(k[2], (B,), 0, N)
    nact = jax.random.randint(k[3], (B,), 0, N)
    rew = jax.random.normal(k[4], (3, B))
    done = (jax.random.uniform(k[5], (B,)) < 0.1).astype(jnp.float32)
    tau_hat = (jnp.arange(TAU) + 0.5) / TAU
    data = qrdqn_nstep_td_data(q, nq, act, nact, rew, done, tau_hat, None)

    # parity check first
    l0, per0 = jax.jit(lambda d: origin.qrdqn_nstep_td_error(d, 0.99, 3))(data)
    l1, per1 = jax.jit(lambda d: qrdqn_iota(d, 0.99, 3))(data)
    print("qrdqn parity:", float(jnp.max(jnp.abs(per0 - per1))), flush=True)

    print(f"--- qrdqn tau={TAU} B={B} N={N} ({MB:.0f}MB per q) ---",
          flush=True)
    for nm, fn in (("origin", origin.qrdqn_nstep_td_error),
                   ("iota", qrdqn_iota),
                   ("ops (hybrid gathers)", ops.qrdqn_nstep_td_error)):
        t = bench_fn(lambda a, _f=fn: _f(
            qrdqn_nstep_td_data(a[0], a[1], act, nact, a[2], done, tau_hat,
                                None), 0.99, 3)[0], (q, nq, rew))
        p(f"qrdqn fwd {nm}", t, 2 * MB)

        def loss(q_, nq_, rw_, _f=fn):
            return _f(qrdqn_nstep_td_data(q_, nq_, act, nact, rw_, done,
                                          tau_hat, None), 0.99, 3)[0]
        t = bench_fn(lambda a, _l=loss: jnp.sum(jax.grad(_l)(a[0], a[1], a[2])),
                     (q, nq, rew))
        p(f"qrdqn fwd+grad {nm}", t, 3 * MB)


def _iqn(TAU, B, N, k, MB):
    act = jax.random.randint(k[2], (B,), 0, N)
    nact = jax.random.randint(k[3], (B,), 0, N)
    rew = jax.random.normal(k[4], (3, B))
    done = (jax.random.uniform(k[5], (B,)) < 0.1).astype(jnp.float32)
    # ---- iqn (tau, B, N) ----
    qi = jax.random.normal(k[0], (TAU, B, N))
    nqi = jax.random.normal(k[1], (TAU, B, N))
    rq = jax.random.uniform(k[6], (TAU, B))
    datai = iqn_nstep_td_data(qi, nqi, act, nact, rew, done, rq, None)
    l0, per0 = jax.jit(lambda d: origin.iqn_nstep_td_error(d, 0.99, 3))(datai)
    l1, per1 = jax.jit(lambda d: iqn_iota(d, 0.99, 3))(datai)
    print("iqn parity:", float(jnp.max(jnp.abs(per0 - per1))), flush=True)

    print(f"--- iqn tau={TAU} B={B} N={N} ---", flush=True)
    for nm, fn in (("origin", origin.iqn_nstep_td_error),
                   ("iota", iqn_iota),
                   ("ops (hybrid gathers)", ops.iqn_nstep_td_error)):
        t = bench_fn(lambda a, _f=fn: _f(
            iqn_nstep_td_data(a[0], a[1], act, nact, a[2], done, rq, None),
            0.99, 3)[0], (qi, nqi, rew))
        p(f"iqn fwd {nm}", t, 2 * MB)

        def loss(q_, nq_, rw_, _f=fn):
            return _f(iqn_nstep_td_data(q_, nq_, act, nact, rw_, done, rq,
                                        None), 0.99, 3)[0]
        t = bench_fn(lambda a, _l=loss: jnp.sum(jax.grad(_l)(a[0], a[1], a[2])),
                     (qi, nqi, rew))
        p(f"iqn fwd+grad {nm}", t, 3 * MB)


if __name__ == "__main__":
    import sys
    main(sys.argv[1] if len(sys.argv) > 1 else "all")
