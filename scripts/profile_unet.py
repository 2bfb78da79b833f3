"""Op-level profile of the UNet forward on the current JAX backend.

PERF_NOTES lever 3: capture a jax.profiler trace of the batch-4 bf16 UNet
forward and print the top ops by self time, parsed from the xplane protobuf
via tensorboard_plugin_profile (no TensorBoard UI needed — works headless
through the axon tunnel if device events make it into the xplane).

Usage:
    python scripts/profile_unet.py              # real backend (TPU)
    HEDIT_PROFILE_CPU=1 python scripts/profile_unet.py   # smoke-test on CPU
    HEDIT_PROFILE_TINY=1 ...                    # tiny UNet config
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile

# tensorboard_plugin_profile ships _pb2 files stale for the installed C++
# protobuf runtime; the pure-Python impl accepts them (set pre-import).
os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")

if os.environ.get("HEDIT_PROFILE_CPU"):
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(os.path.dirname(
                          os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hedit_tpu.models.unet_sd import UNet2DCondition, UNetConfig  # noqa: E402


def build(tiny: bool):
    import dataclasses
    cfg = UNetConfig.tiny() if tiny else UNetConfig.sd15()
    cfg = dataclasses.replace(cfg, dtype=jnp.bfloat16)
    unet = UNet2DCondition(cfg)
    res = 16 if tiny else 64
    ctx_dim = cfg.cross_attention_dim
    x = jnp.zeros((4, res, res, 4), jnp.bfloat16)
    t = jnp.full((4,), 500, jnp.int32)
    ctx = jnp.zeros((4, 77, ctx_dim), jnp.bfloat16)
    params = jax.eval_shape(lambda: unet.init(jax.random.PRNGKey(0), x, t, ctx))
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), params)
    fwd = jax.jit(lambda p, x, t, c: unet.apply(p, x, t, c))
    return fwd, params, x, t, ctx


def top_ops_from_logdir(logdir: str, n: int = 30):
    """Parse the newest xplane.pb under logdir; aggregate device-plane op
    durations by event name.  The tensorboard_plugin_profile converters are
    version-broken against this TF build, so read the XSpace proto directly
    (pure-python protobuf impl handles the stale generated code)."""
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(logdir, "**", "*.xplane.pb"),
                             recursive=True))
    if not paths:
        raise FileNotFoundError(f"no xplane.pb under {logdir}")
    xspace = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    print("# planes:", [(p.name, [l.name for l in p.lines])
                        for p in xspace.planes], file=sys.stderr)
    device_planes = [p for p in xspace.planes
                     if "TPU" in p.name or "/device" in p.name]
    if not device_planes:  # CPU smoke test: XLA ops live on the host plane
        device_planes = [p for p in xspace.planes if p.name == "/host:CPU"]

    rows = {}
    total_ps = 0
    for plane in device_planes:
        meta = plane.event_metadata
        has_xla_ops = any(l.name == "XLA Ops" for l in plane.lines)
        for line in plane.lines:
            if has_xla_ops:
                if line.name != "XLA Ops":
                    continue
            elif "xla" not in line.name.lower():
                continue
            for ev in line.events:
                name = meta[ev.metadata_id].name if ev.metadata_id in meta \
                    else f"id{ev.metadata_id}"
                r = rows.setdefault(name, [0, 0])
                r[0] += ev.duration_ps
                r[1] += 1
                total_ps += ev.duration_ps
    out = sorted(rows.items(), key=lambda kv: -kv[1][0])[:n]
    return total_ps, [(name, dur_ps / 1e9, cnt) for name, (dur_ps, cnt) in out]


def main():
    tiny = bool(os.environ.get("HEDIT_PROFILE_TINY"))
    fwd, params, x, t, ctx = build(tiny)
    print(f"backend={jax.devices()[0].platform} tiny={tiny}", file=sys.stderr)

    # warm up / compile outside the trace
    out = fwd(params, x, t, ctx)
    jax.device_get(out)

    logdir = os.environ.get("HEDIT_PROFILE_DIR") or tempfile.mkdtemp(
        prefix="unet_prof_")
    with jax.profiler.trace(logdir):
        o = None
        for _ in range(3):
            o = fwd(params, jnp.where(o is None, x, x) if o is None else
                    x + 0 * o[..., :4], t, ctx)
        jax.device_get(o)

    total_ps, rows = top_ops_from_logdir(logdir)
    print(f"# logdir={logdir} device_total={total_ps / 1e9:.3f}ms (3 fwd)")
    print(f"{'op':<60} {'ms':>9} {'%':>6} {'count':>6}")
    for name, ms, cnt in rows:
        pct = 100 * ms * 1e9 / total_ps if total_ps else 0
        print(f"{name[:60]:<60} {ms:9.3f} {pct:6.1f} {cnt:6d}")


if __name__ == "__main__":
    main()
