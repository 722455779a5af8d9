"""2-process multi-host test: jax.distributed over two CPU processes.

The reference has no multi-process story at all (single-host DataParallel,
SURVEY §2.10); the TPU framework's multi-host path is jax.distributed +
global jax.Arrays built with make_array_from_process_local_data
(parallel/mesh.py shard_global_batch). This test forms a REAL 2-process
cluster (coordinator over localhost, gloo CPU collectives, 2 devices per
process), runs one G step + one D step of the tiny GAN on the 4-device
global mesh, and asserts both processes agree with each other AND with the
same step executed single-process on a 4-device mesh.

The workers must escape the axon TPU sitecustomize (it initializes the
PJRT backend at interpreter start, which would freeze process_count at 1),
so the parent strips PALLAS_AXON_POOL_IPS from the subprocess environment.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO_ROOT, "tests", "_multihost_worker.py")
PORT = 57311


def _spawn(pid, nproc):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)  # skip axon PJRT registration
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_NUM_CPU_DEVICES"] = "2"
    # The forced-host-device-count flag is ignored in multi-process mode;
    # make sure a conftest-set value doesn't confuse anything.
    env.pop("XLA_FLAGS", None)
    return subprocess.Popen(
        [sys.executable, WORKER, str(pid), str(nproc), str(PORT)],
        stdout=subprocess.PIPE,
        stderr=subprocess.PIPE,
        env=env,
        cwd=REPO_ROOT,
        text=True,
    )


def test_two_process_gan_step_matches_single_process():
    procs = [_spawn(0, 2), _spawn(1, 2)]
    results = {}
    logs = []
    for p in procs:
        out, err = p.communicate(timeout=600)
        logs.append((p.returncode, out, err))
        for line in out.splitlines():
            if line.startswith("RESULT "):
                r = json.loads(line[len("RESULT "):])
                results[r["pid"]] = r
    assert all(p.returncode == 0 for p in procs), logs
    assert set(results) == {0, 1}, logs

    # Cross-process agreement: SPMD — every process computes the same
    # global values.
    for k in ("loss_g", "loss_d_real", "loss_d_fake", "checksum"):
        np.testing.assert_allclose(
            results[0][k], results[1][k], rtol=1e-5,
            err_msg=f"processes disagree on {k}",
        )

    # Single-process reference on a 4-device mesh (the parent runs under
    # the 8-virtual-device CPU conftest).
    import dataclasses

    from nerf_from_image_tpu.engine import gan
    from nerf_from_image_tpu.parallel import mesh as mesh_mod
    from tests.test_gan_engine import random_batch, tiny_configs, tiny_models

    if jax.device_count() < 4:
        pytest.skip("needs 4 virtual devices for the reference run")
    mesh = mesh_mod.make_mesh(n_data=4, devices=jax.devices()[:4])
    model, disc = tiny_models()
    config, render_config = tiny_configs()
    config = dataclasses.replace(config, batch_size=4)
    state = gan.init_gan_state(
        config, model, disc, jax.random.key(0), render_config
    )
    state = mesh_mod.replicate(mesh, state)
    rng = np.random.default_rng(0)
    batch = mesh_mod.shard_batch(mesh, random_batch(rng, 4))
    real_batch = mesh_mod.shard_batch(
        mesh, random_batch(rng, 4, with_images=True)
    )
    fake_batch = mesh_mod.shard_batch(mesh, random_batch(rng, 4))
    with jax.sharding.set_mesh(mesh):
        state, gm = jax.jit(
            lambda s, b, k: gan.g_step(
                config, render_config, model, disc, s, b, k
            )
        )(state, batch, jax.random.key(1))
        state, dm = jax.jit(
            lambda s, rb, fb, k: gan.d_step(
                config, render_config, model, disc, s, rb, fb, k
            )
        )(state, real_batch, fake_batch, jax.random.key(2))

    np.testing.assert_allclose(
        results[0]["loss_g"], float(gm["loss_g"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        results[0]["loss_d_real"], float(dm["loss_d_real"]), rtol=1e-4
    )
    np.testing.assert_allclose(
        results[0]["loss_d_fake"], float(dm["loss_d_fake"]), rtol=1e-4
    )


def test_partial_explicit_topology_raises(monkeypatch):
    """COORDINATOR_ADDRESS with an incomplete NFI_* topology must raise
    instead of falling through to the error-swallowing zero-config probe
    (which would leave each host an unsynced single-process replica)."""
    from nerf_from_image_tpu.parallel import mesh as mesh_mod

    monkeypatch.setenv("COORDINATOR_ADDRESS", "localhost:1")
    monkeypatch.setenv("NFI_NUM_PROCESSES", "2")
    monkeypatch.delenv("NFI_PROCESS_ID", raising=False)
    with pytest.raises(ValueError, match="NFI_PROCESS_ID"):
        mesh_mod.maybe_init_multihost()
    monkeypatch.delenv("NFI_NUM_PROCESSES")
    monkeypatch.setenv("NFI_PROCESS_ID", "0")
    with pytest.raises(ValueError, match="NFI_NUM_PROCESSES"):
        mesh_mod.maybe_init_multihost()


def test_two_process_train_driver_end_to_end(tmp_path):
    """Driver-level multi-host smoke: train.py itself (synthetic dataset,
    2 processes x 2 CPU devices, 4 steps) — exercises maybe_init_multihost
    (explicit COORDINATOR_ADDRESS/NFI_* topology), shard_batch's
    global-batch ingestion, and orbax checkpointing through the real entry
    point, not just the engine-level worker."""
    import ast

    port = PORT + 2
    argv = [
        sys.executable, os.path.join(REPO_ROOT, "train.py"),
        "--dataset", "synthetic", "--multihost",
        "--batch_size", "4", "--resolution", "16",
        "--iterations", "4", "--max_images", "8",
        "--root_path", str(tmp_path),
        "--sdf_pretrain_steps", "1", "--fine_sampling", "",
    ]
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.pop("PALLAS_AXON_POOL_IPS", None)
        env.pop("XLA_FLAGS", None)
        env["JAX_PLATFORMS"] = "cpu"
        env["JAX_NUM_CPU_DEVICES"] = "2"
        env["COORDINATOR_ADDRESS"] = f"localhost:{port}"
        env["NFI_NUM_PROCESSES"] = "2"
        env["NFI_PROCESS_ID"] = str(pid)
        procs.append(
            subprocess.Popen(
                argv, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                env=env, cwd=REPO_ROOT, text=True,
            )
        )
    outs = []
    for p in procs:
        # Two concurrent cold train.py compiles on a small (2-CPU) host
        # take a while the FIRST time; the persistent /tmp/jax_cache
        # compile cache (set up by train.py) makes re-runs fast.
        out, err = p.communicate(timeout=2400)
        outs.append((p.returncode, out, err))
    assert all(o[0] == 0 for o in outs), outs

    def last_losses(out):
        for line in reversed(out.splitlines()):
            if line.startswith("[3] im/s"):
                return ast.literal_eval(line.split(" ", 3)[3])
        raise AssertionError(f"no step-3 loss line in:\n{out}")

    m0, m1 = (last_losses(o[1]) for o in outs)
    # SPMD: both processes compute the identical global step.
    for k in m0:
        np.testing.assert_allclose(
            m0[k], m1[k], rtol=1e-5, err_msg=f"processes disagree on {k}"
        )
    for _, out, _ in outs:
        assert "multihost: process" in out, out
    # The shared checkpoint was written (orbax primary-host write).
    ckpt_root = os.path.join(str(tmp_path), "gan_checkpoints")
    assert os.path.isdir(ckpt_root), os.listdir(str(tmp_path))
    found = []
    for root, _, files in os.walk(ckpt_root):
        found += [os.path.join(root, f) for f in files]
    assert found, "empty checkpoint tree"
