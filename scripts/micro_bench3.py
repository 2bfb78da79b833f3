"""True per-executable latency via dependency chaining: x_{i+1} = f(x_i)
serializes device work without host transfers; one device_get at the end."""
import dataclasses, json, os, time
import jax

def main():
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    import jax.numpy as jnp
    import numpy as np
    from hedit_tpu.models.unet_sd import UNet2DCondition, UNetConfig
    from hedit_tpu.control.p2p import P2PControl

    S = 50
    ucfg = dataclasses.replace(UNetConfig.sd15(), dtype=jnp.bfloat16)
    unet = UNet2DCondition(ucfg)
    shapes = jax.eval_shape(unet.init, jax.random.PRNGKey(0), jnp.zeros((1,64,64,4)), jnp.array(1), jnp.zeros((1,77,768)))
    params = jax.tree_util.tree_map(lambda s: jnp.full(s.shape, 1e-3, s.dtype), shapes)
    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(4,64,64,4).astype(np.float32)*0.2)
    ctx = jnp.asarray(rs.randn(4,77,768).astype(np.float32)*0.1)
    ctrl = P2PControl(
        step=jnp.zeros((), jnp.int32), cross_alpha=jnp.ones((S+1,77)),
        refine_mapper=jnp.arange(77), refine_alphas=jnp.ones(77),
        replace_mapper=jnp.eye(77), equalizer=jnp.ones(77),
        self_replace_until=17, cond_start=2, blend_px=256,
    )

    results = {}

    def chain_time(f, x0, n=10):
        xx = f(x0)
        jax.device_get(xx)  # warm
        t0 = time.perf_counter()
        xx = x0
        for _ in range(n):
            xx = f(xx)
        jax.device_get(xx)
        return (time.perf_counter() - t0) / n

    for use_pallas, name in [(True, "plain_b4_pallas"), (False, "plain_b4_xla")]:
        f = jax.jit(lambda xx, up=use_pallas: unet.apply(params, xx, jnp.array(501), ctx, use_pallas=up))
        results[name + "_ms"] = round(chain_time(f, x) * 1e3, 1)
        print(name, results[name + "_ms"], flush=True)

    def ctrl_f(xx):
        out, aux = unet.apply(params, xx, jnp.array(501), ctx, ctrl, True, mutable=["attn_store"])
        return out
    f = jax.jit(ctrl_f)
    results["ctrl_b4_ms"] = round(chain_time(f, x) * 1e3, 1)
    print("ctrl_b4", results["ctrl_b4_ms"], flush=True)

    # batch 16 scaling
    x16 = jnp.concatenate([x]*4)
    ctx16 = jnp.concatenate([ctx]*4)
    f16 = jax.jit(lambda xx: unet.apply(params, xx, jnp.array(501), ctx16))
    results["plain_b16_ms"] = round(chain_time(f16, x16) * 1e3, 1)
    print("plain_b16", results["plain_b16_ms"], flush=True)
    print(json.dumps(results))

if __name__ == "__main__":
    main()
