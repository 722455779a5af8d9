"""Op-level trace of the bench step: capture a jax.profiler trace on the
real TPU and aggregate device-op durations by fusion name.

Run: python scripts/profile_trace.py [out_dir] [key=value ...]
Options (same meaning as scripts/bench_step_config.py): splat=0|1
chunk=N|none save_rows=0|1 rematpct=N|none
"""

import collections
import glob
import os
import sys

sys.path.insert(0, ".")
sys.path.insert(0, "scripts")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp
import numpy as np


def build_step(opts=None):
    from nerf_from_image_tpu.engine.render import RenderConfig, render
    from nerf_from_image_tpu.models.generator import Generator

    opts = opts or {}
    chunk = opts.get("chunk", "none")
    BATCH, RES, SAMPLES = 4, 128, 64
    model = Generator(
        latent_dim=512, scene_range=1.4, attention_values=10, use_sdf=True
    )
    config = RenderConfig(
        resolution=RES,
        depth_samples_per_ray=SAMPLES,
        fine_sampling=True,
        scene_range=1.4,
        white_background=False,
        plane_dtype="bfloat16",
        query_chunk=None if chunk == "none" else int(chunk),
        plane_splat=opts.get("splat", "0") == "1",
        splat_save_rows=opts.get("save_rows", "1") == "1",
        splat_block=tuple(
            int(x) for x in opts.get("block", "16,16,4").split(",")
        ),
        splat_window=tuple(
            int(x) for x in opts.get("window", "128,64").split(",")
        ),
    )
    variables = jax.jit(lambda k: model.init(k, method="init_all"))(
        jax.random.key(0)
    )
    rng = np.random.default_rng(0)
    mats = []
    for _ in range(BATCH):
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        m = np.eye(4)
        m[:3, :3] = q
        m[:3, 3] = q @ np.array([0.0, 0.0, 3.0])
        mats.append(m)
    pose = jnp.asarray(np.stack(mats).astype(np.float32))
    focal = jnp.full((BATCH,), 1.2)
    ws = jax.random.normal(jax.random.key(1), (BATCH, model.num_ws, 512)) * 0.1

    def loss_fn(ws, pose):
        out, _ = render(config, model, variables, pose, focal, ws)
        return jnp.sum(jnp.square(out.rgb)) + jnp.sum(jnp.square(out.mask))

    step = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))
    rematpct = opts.get("rematpct", "none")
    if rematpct != "none":
        step = step.lower(ws, pose).compile(
            compiler_options={
                "xla_jf_rematerialization_percent_shared_memory_limit": (
                    rematpct
                )
            }
        )
    return step, ws, pose


def force(out):
    leaf = jax.tree.leaves(out)[0]
    np.asarray(jax.device_get(leaf.ravel()[0:1]))


def main():
    args = sys.argv[1:]
    out_dir = "/tmp/jax_trace"
    opts = {}
    for a in args:
        if "=" in a:
            k, _, v = a.partition("=")
            opts[k] = v
        else:
            out_dir = a
    step, ws, pose = build_step(opts)
    force(step(ws, pose))  # compile + warmup

    jax.profiler.start_trace(out_dir)
    for _ in range(2):
        g = step(ws, pose)
    force(g)
    jax.profiler.stop_trace()

    paths = glob.glob(
        os.path.join(out_dir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        print("no xplane.pb produced under", out_dir)
        return
    path = max(paths, key=os.path.getmtime)
    with open(path, "rb") as f:
        data = jax.profiler.ProfileData.from_serialized_xspace(f.read())
    per_op = collections.Counter()
    nplanes = 0
    for plane in data.planes:
        name = plane.name
        if "TPU" not in name and "tpu" not in name and "device" not in name.lower():
            continue
        nplanes += 1
        for line in plane.lines:
            for ev in line.events:
                per_op[ev.name] += ev.duration_ns
    if nplanes == 0:
        print("planes seen:", [p.name for p in data.planes])
        for plane in data.planes:
            for line in plane.lines:
                for ev in line.events:
                    per_op[ev.name] += ev.duration_ns
    total = sum(per_op.values())
    print(f"total accounted: {total/1e6:.2f} ms over {len(per_op)} op names")
    for name, ns in per_op.most_common(40):
        print(f"{ns/1e6:10.3f} ms  {100*ns/max(total,1):5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
