"""Subprocess worker for the 2-process multi-host test.

Run as: python tests/_multihost_worker.py <process_id> <num_processes> <port>

Each process owns 2 CPU devices (JAX_NUM_CPU_DEVICES set by the parent);
jax.distributed.initialize forms the cluster, the mesh spans all
num_processes * 2 devices, and dataset ingestion goes through
parallel.mesh.shard_batch — which on multi-process routes through
jax.make_array_from_process_local_data (shard_global_batch). One G step and
one D step of the tiny GAN run on the global mesh; the final line printed
is a JSON dict of the losses and a parameter checksum, which the parent
compares across processes and against a single-process 4-device run.
"""

import json
import os
import sys

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO_ROOT)


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    import jax

    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc,
        process_id=pid,
    )
    assert jax.process_count() == nproc, jax.process_count()
    assert jax.device_count() == 2 * nproc, jax.device_count()

    import dataclasses

    import numpy as np

    from nerf_from_image_tpu.engine import gan
    from nerf_from_image_tpu.parallel import mesh as mesh_mod
    from tests.test_gan_engine import random_batch, tiny_configs, tiny_models

    model, disc = tiny_models()
    config, render_config = tiny_configs()
    config = dataclasses.replace(config, batch_size=4)
    state = gan.init_gan_state(
        config, model, disc, jax.random.key(0), render_config
    )

    mesh = mesh_mod.make_mesh()
    state = mesh_mod.replicate(mesh, state)
    # Every process computes the identical global batch (the samplers are
    # deterministic); shard_batch slices this process's rows and builds the
    # global array via jax.make_array_from_process_local_data.
    rng = np.random.default_rng(0)
    batch = mesh_mod.shard_batch(mesh, random_batch(rng, 4))
    real_batch = mesh_mod.shard_batch(
        mesh, random_batch(rng, 4, with_images=True)
    )
    fake_batch = mesh_mod.shard_batch(mesh, random_batch(rng, 4))
    assert len(jax.tree.leaves(batch)[0].sharding.device_set) == 2 * nproc

    g_step = jax.jit(
        lambda s, b, k: gan.g_step(config, render_config, model, disc, s, b, k)
    )
    d_step = jax.jit(
        lambda s, rb, fb, k: gan.d_step(
            config, render_config, model, disc, s, rb, fb, k
        )
    )
    with jax.sharding.set_mesh(mesh):
        state, gm = g_step(state, batch, jax.random.key(1))
        state, dm = d_step(state, real_batch, fake_batch, jax.random.key(2))

    leaves = jax.tree.leaves(state.params_g)
    checksum = float(
        sum(jnp_sum_abs(x) for x in leaves if hasattr(x, "dtype"))
    )
    print(
        "RESULT "
        + json.dumps(
            {
                "pid": pid,
                "loss_g": float(gm["loss_g"]),
                "loss_d_real": float(dm["loss_d_real"]),
                "loss_d_fake": float(dm["loss_d_fake"]),
                "checksum": checksum,
            }
        ),
        flush=True,
    )


def jnp_sum_abs(x):
    import jax.numpy as jnp

    return jnp.sum(jnp.abs(x.astype(jnp.float32)))


if __name__ == "__main__":
    main()
