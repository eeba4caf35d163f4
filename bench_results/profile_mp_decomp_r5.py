"""r5 mixed-precision decomposition (VERDICT r4 ask #1): where does the
1.4-1.8x bf16 LSTM layer win collapse to 1.06x on the end-to-end train step
(bench row train_step_bf16_T32_B256_h512, driver r4: 1900 -> 1778 us)?

Times every leg of the step in f32 and bf16 at the bench config
(obs=256, H=512, L=2, A=64, T=32, B=256), plus a longer/deeper config
(S=64, L=3) where the LSTM share of the step is larger.

Run on the real TPU: PYTHONPATH=/root/repo:$PYTHONPATH python
bench_results/profile_mp_decomp_r5.py
"""
import functools

import jax
import jax.numpy as jnp
import optax

from di_hpc_tpu import network, ops, origin
from di_hpc_tpu.models import (
    ActorCriticConfig, TrainBatch, init_actor_critic, make_train_step,
)
from di_hpc_tpu.models.actor_critic_lstm import actor_critic_forward
from di_hpc_tpu.utils.profiling import bench_fn


def p(name, t, extra=""):
    print(f"{name:<44} {t*1e6:9.1f} us {extra}", flush=True)


def decomp(T, B, L, tag, H=512, probe_precision=False):
    cfg = ActorCriticConfig(obs_dim=256, hidden_size=H, num_layers=L,
                            action_dim=64)
    kt = jax.random.split(jax.random.PRNGKey(4), 6)
    params = init_actor_critic(kt[0], cfg)
    tb = TrainBatch(
        obs=jax.random.normal(kt[1], (T + 1, B, cfg.obs_dim)),
        actions=jax.random.randint(kt[2], (T, B), 0, cfg.action_dim),
        rewards=jax.random.normal(kt[3], (T, B)),
        behaviour_logits=jax.random.normal(kt[4], (T, B, cfg.action_dim)),
    )
    optimizer = optax.adam(3e-4)
    opt0 = optimizer.init(params)
    print(f"=== {tag}: T={T} B={B} H={H} L={L} ===", flush=True)

    # -- full step, f32 vs bf16 --
    ts = {}
    for name, dt in (("f32", None), ("bf16", jnp.bfloat16)):
        step_fn = make_train_step(cfg, optimizer, compute_dtype=dt)

        def whole(a, _step=step_fn):
            pa, oa, ba = a
            p2, o2, m = _step(pa, oa, ba)
            # depend on EVERY updated leaf or XLA DCEs the backward + adam
            # (returning only total_loss measured the forward alone)
            return (m["total_loss"] * 1e-12
                    + sum(jnp.sum(l.astype(jnp.float32))
                          for l in jax.tree.leaves(p2)))
        ts[name] = bench_fn(whole, (params, opt0, tb))
        p(f"full step {name}", ts[name])
    p("  -> step ratio", 0.0, f"{ts['f32']/ts['bf16']:.2f}x")

    # -- model fwd (embed+LSTM+heads), f32 vs bf16 --
    pc = jax.tree.map(lambda v: v.astype(jnp.bfloat16)
                      if jnp.issubdtype(v.dtype, jnp.floating) else v, params)
    obs_c = tb.obs.astype(jnp.bfloat16)
    f = {}
    f["f32"] = bench_fn(
        lambda a: actor_critic_forward(a[0], a[1], None, cfg.norm_type)[0],
        (params, tb.obs))
    f["bf16"] = bench_fn(
        lambda a: actor_critic_forward(a[0], a[1], None, cfg.norm_type)[0],
        (pc, obs_c))
    p("model fwd f32", f["f32"])
    p("model fwd bf16", f["bf16"], f"  ({f['f32']/f['bf16']:.2f}x)")

    # -- model fwd+grad wrt params (sum loss, no vtrace), f32 vs bf16;
    # bf16 leg includes the cast-from-f32-master like the real step --
    def mloss(p_, o_, dt):
        if dt is not None:
            p_ = jax.tree.map(lambda v: v.astype(dt)
                              if jnp.issubdtype(v.dtype, jnp.floating) else v,
                              p_)
            o_ = o_.astype(dt)
        lg, vv, _ = actor_critic_forward(p_, o_, None, cfg.norm_type)
        return (jnp.sum(lg.astype(jnp.float32) ** 2)
                + jnp.sum(vv.astype(jnp.float32) ** 2))

    def gsum(tree):
        return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(tree))

    g = {}
    for name, dt in (("f32", None), ("bf16", jnp.bfloat16)):
        g[name] = bench_fn(
            lambda a, _dt=dt: gsum(jax.grad(mloss)(a[0], a[1], _dt)),
            (params, tb.obs))
        p(f"model fwd+grad {name}", g[name])
    p("  -> fwd+grad ratio", 0.0, f"{g['f32']/g['bf16']:.2f}x")

    # -- LSTM alone (kernel path), fwd and fwd+grad, f32 vs bf16 --
    x_f32 = jax.nn.relu(jnp.einsum("sbo,oh->sbh", tb.obs, params.embed_w)
                        + params.embed_b)
    x_b = x_f32.astype(jnp.bfloat16)
    lf = {}
    lf["f32"] = bench_fn(
        lambda a: network.lstm_fused(a[0], a[1], None, cfg.norm_type)[0],
        (params.lstm, x_f32))
    lf["bf16"] = bench_fn(
        lambda a: network.lstm_fused(a[0], a[1], None, cfg.norm_type)[0],
        (pc.lstm, x_b))
    p("lstm fwd f32", lf["f32"])
    p("lstm fwd bf16", lf["bf16"], f"  ({lf['f32']/lf['bf16']:.2f}x)")

    def lloss(pl_, xx):
        y, _ = network.lstm_fused(pl_, xx, None, cfg.norm_type)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    lg = {}
    lg["f32"] = bench_fn(
        lambda a: gsum(jax.grad(lloss, argnums=(0, 1))(a[0], a[1])),
        (params.lstm, x_f32))
    lg["bf16"] = bench_fn(
        lambda a: gsum(jax.grad(lloss, argnums=(0, 1))(a[0], a[1])),
        (pc.lstm, x_b))
    p("lstm fwd+grad f32", lg["f32"])
    p("lstm fwd+grad bf16", lg["bf16"], f"  ({lg['f32']/lg['bf16']:.2f}x)")

    if probe_precision:
        # Hypothesis probe: under ambient (default bf16) matmul precision,
        # f32 streams already issue the SAME single-pass bf16 MXU work as
        # bf16 streams — so if the layer is MXU-bound, bf16 can't win.
        # Forcing true-f32 matmul passes (6 bf16 passes per dot) should
        # then be several-x slower; that gap IS the "bf16 win" the old
        # claims measured against.
        def lstm_f32prec(a):
            with jax.default_matmul_precision("float32"):
                y, _ = network.lstm_fused(a[0], a[1], None, cfg.norm_type)
            return jnp.sum(y.astype(jnp.float32) ** 2)
        t_hp = bench_fn(lstm_f32prec, (params.lstm, x_f32))
        p("lstm fwd f32 FORCED-f32-precision", t_hp,
          f"  ({t_hp/lf['f32']:.2f}x of ambient)")

    # -- vtrace loss fwd+grad (always f32 in the step) --
    t_logits = jax.random.normal(kt[5], (T, B, cfg.action_dim))
    value = jax.random.normal(kt[5], (T + 1, B))

    def vloss(tl, v):
        losses = ops.vtrace_error(
            origin.vtrace_data(tl, tb.behaviour_logits, tb.actions, v,
                               tb.rewards, None), 0.99, 0.95)
        return (losses.policy_loss + 0.5 * losses.value_loss
                - 0.01 * losses.entropy_loss)

    tv = bench_fn(lambda a: gsum(jax.grad(vloss, argnums=(0, 1))(a[0], a[1])),
                  (t_logits, value))
    p("vtrace fwd+grad (f32 tail)", tv)

    # -- adam update alone (identical both sides) --
    grads = jax.tree.map(jnp.ones_like, params)

    def adam_only(a):
        gr, pa, oa = a
        updates, o2 = optimizer.update(gr, oa, pa)
        return gsum(optax.apply_updates(pa, updates)) + gsum(o2)

    ta = bench_fn(adam_only, (grads, params, opt0))
    p("adam update (f32 tail)", ta)

    # -- param+obs cast alone (bf16 extra work) --
    def cast_only(a):
        pa, oa = a
        pc_ = jax.tree.map(lambda v: v.astype(jnp.bfloat16)
                           if jnp.issubdtype(v.dtype, jnp.floating) else v, pa)
        return (jnp.sum(pc_.embed_w.astype(jnp.float32))
                + jnp.sum(oa.astype(jnp.bfloat16).astype(jnp.float32)))

    tc = bench_fn(cast_only, (params, tb.obs))
    p("param+obs cast (bf16 extra)", tc)

    # -- accounting --
    print("--- accounting ---", flush=True)
    print(f"  f32 : step {ts['f32']*1e6:7.1f} = model fwd+grad "
          f"{g['f32']*1e6:7.1f} + vtrace {tv*1e6:6.1f} + adam {ta*1e6:6.1f} "
          f"+ resid {(ts['f32']-g['f32']-tv-ta)*1e6:6.1f}", flush=True)
    print(f"  bf16: step {ts['bf16']*1e6:7.1f} = model fwd+grad "
          f"{g['bf16']*1e6:7.1f} + vtrace {tv*1e6:6.1f} + adam {ta*1e6:6.1f} "
          f"+ resid {(ts['bf16']-g['bf16']-tv-ta)*1e6:6.1f}", flush=True)
    return ts


if __name__ == "__main__":
    import sys
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "bench"):
        decomp(32, 256, 2, "bench config", probe_precision=True)
    if which in ("all", "deep"):
        decomp(64, 256, 3, "deeper/longer (LSTM-dominated)")
    if which in ("all", "smallh"):
        # Bandwidth-bound candidate: at H=128 the layer's MXU:HBM ratio
        # drops to ~1 (intensity ~2H flops/byte), so halved bf16 streams
        # should genuinely pay here if anywhere.
        decomp(64, 1024, 2, "small-H bandwidth-bound candidate", H=128)
