"""Micro-bench with host-fetch timing (block_until_ready appears unreliable
through the axon tunnel)."""
import dataclasses, json, os, time
import jax

def timeit(fn, *args, n=5):
    out = jax.device_get(fn(*args))
    times = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = jax.device_get(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)

def main():
    cache_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    import jax.numpy as jnp
    import numpy as np
    from hedit_tpu.models.unet_sd import UNet2DCondition, UNetConfig
    from hedit_tpu.ops.flash_attention import flash_attention, reference_attention

    results = {}
    rs = np.random.RandomState(0)
    for (b, h, s, d) in [(4, 8, 4096, 40), (4, 8, 1024, 80)]:
        q = jnp.asarray(rs.randn(b, h, s, d).astype(np.float32)).astype(jnp.bfloat16)
        k, v = q + 0.1, q + 0.2
        r = {
            "pallas_ms": round(timeit(lambda q,k,v: flash_attention(q,k,v), q,k,v)*1e3, 2),
            "xla_ms": round(timeit(jax.jit(reference_attention), q,k,v)*1e3, 2),
        }
        results[f"attn_s{s}_d{d}"] = r
        print(f"attn_s{s}_d{d}", r, flush=True)
    ucfg = dataclasses.replace(UNetConfig.sd15(), dtype=jnp.bfloat16)
    unet = UNet2DCondition(ucfg)
    shapes = jax.eval_shape(unet.init, jax.random.PRNGKey(0), jnp.zeros((1,64,64,4)), jnp.array(1), jnp.zeros((1,77,768)))
    params = jax.tree_util.tree_map(lambda s: jnp.full(s.shape, 1e-3, s.dtype), shapes)
    x = jnp.asarray(rs.randn(4,64,64,4).astype(np.float32)*0.2)
    ctx = jnp.asarray(rs.randn(4,77,768).astype(np.float32)*0.1)
    fwd_p = jax.jit(lambda p,x,t,c: unet.apply(p,x,t,c,use_pallas=True))
    fwd_x = jax.jit(lambda p,x,t,c: unet.apply(p,x,t,c,use_pallas=False))
    results["unet_b4_pallas_ms"] = round(timeit(fwd_p, params, x, jnp.array(501), ctx)*1e3, 1)
    print("unet_b4_pallas_ms", results["unet_b4_pallas_ms"], flush=True)
    results["unet_b4_xla_ms"] = round(timeit(fwd_x, params, x, jnp.array(501), ctx)*1e3, 1)
    print("unet_b4_xla_ms", results["unet_b4_xla_ms"], flush=True)
    # groupnorm kernel at a qualifying slab (res-32, C=640)
    from hedit_tpu.ops.groupnorm import group_norm_pallas, group_norm_reference
    gx = jnp.asarray(rs.randn(4, 32, 32, 640).astype(np.float32))
    gs, gb = jnp.ones(640), jnp.zeros(640)
    results["gn_pallas_ms"] = round(timeit(
        lambda a: group_norm_pallas(a, gs, gb, groups=32, act="silu"), gx)*1e3, 2)
    results["gn_xla_ms"] = round(timeit(
        jax.jit(lambda a: group_norm_reference(a, gs, gb, groups=32, act="silu")), gx)*1e3, 2)
    print("gn", results["gn_pallas_ms"], results["gn_xla_ms"], flush=True)
    # fp32 comparison
    ucfg32 = UNetConfig.sd15()
    unet32 = UNet2DCondition(ucfg32)
    params32 = jax.tree_util.tree_map(lambda s: jnp.full(s.shape, 1e-3, jnp.float32), shapes)
    fwd32 = jax.jit(lambda p,x,t,c: unet32.apply(p,x,t,c))
    try:
        results["unet_b4_fp32_ms"] = round(timeit(fwd32, params32, x, jnp.array(501), ctx)*1e3, 1)
        print("unet_b4_fp32_ms", results["unet_b4_fp32_ms"], flush=True)
    except Exception as e:
        results["unet_b4_fp32_ms"] = f"failed: {type(e).__name__}"
    print(json.dumps(results, indent=1))

if __name__ == "__main__":
    main()
