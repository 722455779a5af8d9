"""End-to-end bench-step throughput for ONE render configuration.

Runs bench.py's exact loss/grad step (grads wrt ws AND pose, B=4, 128^2
rays, 64+64 samples) under a configuration given on the command line, and
prints rays/s plus the compiled step's XLA temp-memory size. One config
per process: an OOM on the axon tunnel kills the TPU worker, so sweeps
must isolate each configuration (see ops/pallas/__init__.py).

Usage:
  python scripts/bench_step_config.py [key=value ...]
    splat=0|1          plane_splat
    chunk=N|none       query_chunk (points per chunk per batch element)
    dtype=bfloat16|f32 plane_dtype
    block=th,tw,ts     splat_block
    window=WY,WX       splat_window
    batch=N            batch size (default 4)
    iters=N            timing iterations (default 8)
    memonly=1          only print memory_analysis, skip execution
"""

import sys

sys.path.insert(0, ".")

import dataclasses
import json
import os
import time

import numpy as np

import jax

os.makedirs("/tmp/jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import jax.numpy as jnp

RES = 128
SAMPLES = 64


def parse_args(argv):
    opts = {
        "splat": "0",
        "chunk": "none",
        "dtype": "bfloat16",
        "block": "16,16,4",
        "window": "128,64",
        "batch": "4",
        "iters": "8",
        "memonly": "0",
        "save_rows": "1",
        # TPU compiler rematerialization HBM budget (percent of HBM).
        # The axon worker dies (instead of raising RESOURCE_EXHAUSTED)
        # when a program's peak exceeds ~10.3 GiB; XLA's default remat
        # target sits just above that, so memory-heavy configs pass a
        # lower percent to make the compiler remat them into the budget.
        "rematpct": "none",
        # TPU scoped-VMEM budget (KiB) for fusions; lowering it can leave
        # more VMEM for memory-space-assignment to pin gather tables.
        "vmemkib": "none",
    }
    for a in argv:
        k, _, v = a.partition("=")
        if k not in opts:
            raise SystemExit(f"unknown option {k}")
        opts[k] = v
    return opts


def main():
    opts = parse_args(sys.argv[1:])
    from nerf_from_image_tpu.engine.render import RenderConfig, render
    from nerf_from_image_tpu.models.generator import Generator

    batch = int(opts["batch"])
    chunk = None if opts["chunk"] == "none" else int(opts["chunk"])
    block = tuple(int(x) for x in opts["block"].split(","))
    window = tuple(int(x) for x in opts["window"].split(","))
    dtype = None if opts["dtype"] in ("f32", "none") else opts["dtype"]

    model = Generator(
        latent_dim=512, scene_range=1.4, attention_values=10, use_sdf=True
    )
    config = RenderConfig(
        resolution=RES,
        depth_samples_per_ray=SAMPLES,
        fine_sampling=True,
        scene_range=1.4,
        white_background=False,
        plane_dtype=dtype,
        query_chunk=chunk,
        plane_splat=opts["splat"] == "1",
        splat_block=block,
        splat_window=window,
        splat_save_rows=opts["save_rows"] == "1",
    )
    variables = jax.jit(lambda k: model.init(k, method="init_all"))(
        jax.random.key(0)
    )

    rng = np.random.default_rng(0)
    mats = []
    for _ in range(batch):
        q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
        if np.linalg.det(q) < 0:
            q[:, 0] *= -1
        m = np.eye(4)
        m[:3, :3] = q
        m[:3, 3] = q @ np.array([0.0, 0.0, 3.0])
        mats.append(m)
    pose = jnp.asarray(np.stack(mats).astype(np.float32))
    focal = jnp.full((batch,), 1.2)
    ws = (
        jax.random.normal(jax.random.key(1), (batch, model.num_ws, 512))
        * 0.1
    )

    def loss_fn(ws, pose):
        out, _ = render(config, model, variables, pose, focal, ws)
        return jnp.sum(jnp.square(out.rgb)) + jnp.sum(jnp.square(out.mask))

    step = jax.jit(jax.grad(loss_fn, argnums=(0, 1)))

    lowered = step.lower(ws, pose)
    copts = {}
    if opts["rematpct"] != "none":
        copts["xla_jf_rematerialization_percent_shared_memory_limit"] = (
            opts["rematpct"]
        )
    if opts["vmemkib"] != "none":
        copts["xla_tpu_scoped_vmem_limit_kib"] = opts["vmemkib"]
    compiled = (
        lowered.compile(compiler_options=copts)
        if copts
        else lowered.compile()
    )
    mem = compiled.memory_analysis()
    temp_gb = getattr(mem, "temp_size_in_bytes", 0) / 2**30
    arg_gb = getattr(mem, "argument_size_in_bytes", 0) / 2**30
    out_gb = getattr(mem, "output_size_in_bytes", 0) / 2**30
    print(
        f"memory_analysis: temp={temp_gb:.2f} GiB args={arg_gb:.2f} GiB "
        f"out={out_gb:.2f} GiB",
        flush=True,
    )
    if opts["memonly"] == "1":
        print(json.dumps({"config": opts, "temp_gib": round(temp_gb, 3)}))
        return

    def force(out):
        leaf = jax.tree.leaves(out)[0]
        np.asarray(jax.device_get(leaf.ravel()[0:1]))

    # Execute the explicitly-compiled executable (the jitted `step` would
    # recompile WITHOUT the compiler options).
    step = compiled
    g = step(ws, pose)
    force(g)
    iters = int(opts["iters"])
    t0 = time.perf_counter()
    for _ in range(iters):
        g = step(ws, pose)
    force(g)
    t1 = time.perf_counter()
    rays = batch * RES * RES * iters
    rays_per_s = rays / (t1 - t0)
    print(
        json.dumps(
            {
                "config": {k: v for k, v in opts.items() if k != "memonly"},
                "rays_per_s": round(rays_per_s, 1),
                "ms_per_step": round((t1 - t0) / iters * 1e3, 2),
                "temp_gib": round(temp_gb, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
