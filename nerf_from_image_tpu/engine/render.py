"""Differentiable volume rendering: coarse -> fine orchestration.

Functional JAX re-design of the engine-level renderer (reference:
run.py:176-350). One pure function, jit/pjit-compiled by callers:

  rays -> AABB near/far -> stratified coarse pass -> EG3D weight smoothing
  -> inverse-CDF fine pass -> depth-sorted merge -> alpha composite.

The generator's triplanes are synthesized ONCE per render and the field is
queried per pass (the reference's `sampler` closure contract, made explicit
data-flow). All shapes are static; the sort-merge is a single lax.sort_key_val
over the concatenated sample axis. Randomness flows through an explicit key;
key=None gives the deterministic render used by golden tests and eval.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from nerf_from_image_tpu.ops import aabb, compositing, rays, sampling


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static rendering configuration (hashable: closed over by jit)."""

    resolution: int = 128
    depth_samples_per_ray: int = 64
    fine_sampling: bool = True
    scene_range: float = 1.4
    white_background: bool = False
    use_viewdir: bool = False
    compute_normals: bool = False
    compute_semantics: bool = False
    compute_coords: bool = False
    # Field queries are evaluated in rematerialized chunks of this many
    # points per batch element (None = single call). Bounds the HBM held by
    # the triplane corner gathers: activations inside a chunk are recomputed
    # in the backward pass instead of stored (jax.checkpoint).
    query_chunk: Optional[int] = 131072
    # Pre-pack triplanes into corner-packed gather rows (ops/triplane):
    # one gather per plane per point instead of four.
    pack_planes: bool = True
    # Storage dtype of the gathered plane tables. 'bfloat16' cuts the
    # dominant cost of the render step (the per-point row gathers) ~3x on
    # TPU; all arithmetic before (synthesis) and after (corner FMA, MLP,
    # compositing) stays f32. None keeps the synthesis dtype (strict-f32
    # parity mode, the golden-test contract — reference pins fp32,
    # run.py:59-60).
    plane_dtype: Optional[str] = None
    # Convert the ray-distance depth map to z-buffer depth (driving evals;
    # reference: eval_nusc_persp.py:221-229).
    zbuffer_depth: bool = False
    # Shard the ray grid's H axis over the mesh 'data' axis (sequence-
    # parallel analog: rays are embarrassingly parallel, the per-ray sample
    # scan stays on-device). Used for batch-1 inversion / large renders on
    # multi-chip meshes; params/planes stay replicated and XLA all-gathers
    # the composited maps.
    shard_rays: bool = False
    # Fused-splat backward for the triplane sampling (the dominant
    # backward cost): packed-gather forward + ray-coherent Pallas windowed
    # splat instead of XLA scatter-add (ops/pallas/splat.py). First-order
    # only — leave False for renders that are double-differentiated.
    # Every production render qualifies: inversion/eval, and the training
    # G-step's main render (path_length differentiates only the synthesis
    # map and the volume regularizers decode their own samples through
    # the grid-sample branch — tests/test_splat.py g_step equivalence).
    # Applies when the ray grid divides splat_block — unchunked, or
    # chunked with whole-image-row chunks (each chunk is then itself a
    # ray-coherent tile).
    plane_splat: bool = False
    splat_block: Tuple[int, int, int] = (16, 16, 4)
    # (128, 128) keeps BOTH passes on the kernel's fast branch: the coarse
    # pass's stratified blocks have much larger plane footprints than the
    # surface-clustered fine samples, and a (128, 64) window silently
    # routed the whole coarse splat to the scatter fallback (profiled in
    # bench.py — 232 ms/step of hidden fallback).
    splat_window: Tuple[int, int] = (128, 128)
    # Store the splat backward's dcoord residuals (fastest) vs re-gather
    # them in the backward (saves ~1.6 GB/pass of HBM at bench shapes —
    # what lets the unchunked full-gradient splat step fit a v5e at B=4).
    splat_save_rows: bool = True
    # How the coarse and fine passes are combined:
    #   'pairwise' — sort-free dual-list compositing (all-pairs masked
    #     reductions; no argsort, no 2S-permutation gather, no backward
    #     scatter — see ops/compositing.composite_dual). Algebraically
    #     identical to the reference's sort-merge.
    #   'sort' — argsort over the concatenated sample axis + one flat
    #     global-index gather (the correctness oracle).
    merge_mode: str = "pairwise"


def prepare_rays(
    config: RenderConfig,
    tform_cam2world: jnp.ndarray,
    focal_length: Optional[jnp.ndarray],
    center: Optional[jnp.ndarray] = None,
    bbox: Optional[jnp.ndarray] = None,
    height: Optional[int] = None,
    width: Optional[int] = None,
):
    """Ray bundle + near/far planes for a pixel grid."""
    h = height or config.resolution
    w = width or config.resolution
    ray_origins, ray_directions = rays.get_ray_bundle(
        h, w, focal_length, tform_cam2world, bbox, center
    )
    ray_directions = rays.normalize_directions(ray_directions)
    if config.shard_rays:
        from jax.sharding import PartitionSpec as P

        spec = P(None, "data", None, None)
        ray_origins = jax.lax.with_sharding_constraint(ray_origins, spec)
        ray_directions = jax.lax.with_sharding_constraint(
            ray_directions, spec
        )
    near, far = aabb.compute_near_far_planes(
        ray_origins, ray_directions, config.scene_range
    )
    return ray_origins, ray_directions, near, far


def render_field(
    config: RenderConfig,
    field_fn,
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    near: jnp.ndarray,
    far: jnp.ndarray,
    key: Optional[jax.Array] = None,
    force_no_cam_grad: bool = False,
    viewdir_embedding: Optional[jnp.ndarray] = None,
) -> Tuple[compositing.CompositeOutput, Dict[str, jnp.ndarray]]:
    """Renders a radiance field along the given rays.

    Args:
      field_fn: callable (points [B, N, 3], outputs tuple) -> dict with
        'sigma' [B, N], 'rgb' [B, N, C] and optional extras — typically a
        partial application of Generator.sample_field over fixed planes.

    Returns:
      (composite, aux) where composite holds rgb/depth/mask/normals/semantics
      maps of shape [B, H, W, ...].
    """
    B, H, W, _ = ray_origins.shape
    S = config.depth_samples_per_ray

    key_coarse, key_fine = (
        jax.random.split(key) if key is not None else (None, None)
    )
    query_points, depth_values = sampling.compute_query_points_from_rays(
        ray_origins, ray_directions, near, far, S, key=key_coarse
    )
    if force_no_cam_grad:
        query_points = jax.lax.stop_gradient(query_points)
        depth_values = jax.lax.stop_gradient(depth_values)
        ray_directions = jax.lax.stop_gradient(ray_directions)

    requests = ["sigma", "rgb"]
    if config.compute_normals:
        requests.append("normals")
    if config.compute_semantics:
        requests.append("semantics")
    if config.compute_coords:
        requests.append("coords")
    requests = tuple(requests)

    def query(points):
        flat = points.reshape(B, -1, 3)
        n_points = flat.shape[1]
        emb = None
        if viewdir_embedding is not None:
            # Per-ray embedding [B, H*W, F'] -> per-point [B, N, F'] so it
            # chunks alongside the points (a per-ray layout would regroup
            # samples under the wrong rays inside a chunk).
            s_pass = n_points // (H * W)
            emb = jnp.broadcast_to(
                viewdir_embedding[:, :, None, :],
                (B, H * W, s_pass, viewdir_embedding.shape[-1]),
            ).reshape(B, n_points, -1)
        splat_spec = None
        th, tw, ts = config.splat_block
        s_pass = n_points // (H * W)
        if (
            config.plane_splat
            and config.query_chunk is None
            and H % th == 0
            and W % tw == 0
            and s_pass % ts == 0
            and n_points == H * W * s_pass
        ):
            splat_spec = (
                (H, W, s_pass),
                config.plane_dtype,
                config.splat_block,
                config.splat_window[0],
                config.splat_window[1],
                config.splat_save_rows,
            )
        chunk = config.query_chunk
        if chunk and n_points > chunk:
            # Pad to a chunk multiple so the memory bound holds for ANY
            # point count (non-square driving/demo renders included) —
            # silently falling back to one unchunked query would drop the
            # rematerialization this config exists to guarantee.
            n_chunks = -(-n_points // chunk)
            pad = n_chunks * chunk - n_points
            # Chunks slice the (ray-major, sample-minor) point axis, so a
            # chunk that is a whole number of image ROWS is itself a
            # ray-coherent tile — the Pallas windowed-splat backward
            # applies per chunk with img_shape (rows, W, S). Under
            # jax.checkpoint the splat's gather residuals are
            # rematerialized, keeping the chunked path's memory bound.
            chunk_splat_spec = None
            if (
                config.plane_splat
                and pad == 0
                and n_points == H * W * s_pass
                and chunk % (W * s_pass) == 0
                and (chunk // (W * s_pass)) % th == 0
                and W % tw == 0
                and s_pass % ts == 0
            ):
                chunk_splat_spec = (
                    (chunk // (W * s_pass), W, s_pass),
                    config.plane_dtype,
                    config.splat_block,
                    config.splat_window[0],
                    config.splat_window[1],
                    config.splat_save_rows,
                )
            # splat_spec is only passed when set so plain
            # field_fn(points, outputs[, emb]) callables keep working.
            spec_kw = (
                {"splat_spec": chunk_splat_spec}
                if chunk_splat_spec is not None
                else {}
            )
            flat_p = (
                jnp.pad(flat, ((0, 0), (0, pad), (0, 0))) if pad else flat
            )
            chunked = flat_p.reshape(B, n_chunks, chunk, 3).swapaxes(0, 1)
            if emb is not None:
                emb_p = (
                    jnp.pad(emb, ((0, 0), (0, pad), (0, 0)))
                    if pad else emb
                )
                emb_c = emb_p.reshape(
                    B, n_chunks, chunk, -1
                ).swapaxes(0, 1)
                out = jax.lax.map(
                    jax.checkpoint(
                        lambda pe: field_fn(
                            pe[0], requests, pe[1], **spec_kw
                        )
                    ),
                    (chunked, emb_c),
                )
            else:
                out = jax.lax.map(
                    jax.checkpoint(
                        lambda p: field_fn(p, requests, **spec_kw)
                    ),
                    chunked,
                )
            out = {
                k: v.swapaxes(0, 1).reshape(
                    (B, n_chunks * chunk) + v.shape[3:]
                )[:, :n_points]
                for k, v in out.items()
            }
        elif emb is not None:
            if splat_spec is not None:
                out = field_fn(flat, requests, emb, splat_spec=splat_spec)
            else:
                out = field_fn(flat, requests, emb)
        else:
            if splat_spec is not None:
                out = field_fn(flat, requests, splat_spec=splat_spec)
            else:
                out = field_fn(flat, requests)
        per_sample = {}
        n_samples = points.shape[-2]
        for k, v in out.items():
            if k == "sigma":
                per_sample[k] = v.reshape(B, H, W, n_samples)
            else:
                per_sample[k] = v.reshape(B, H, W, n_samples, -1)
        return per_sample

    coarse = query(query_points)
    sigma = coarse["sigma"]
    channels = {k: v for k, v in coarse.items() if k != "sigma"}

    def fine_pass(sort_fine: bool):
        """EG3D-smoothed importance sampling + fine query (shared by both
        merge modes; reference: run.py:259-311)."""
        weights = compositing.render_volume_density_weights_only(
            sigma, ray_directions, depth_values
        )
        flat_w = compositing.smooth_weights(weights.reshape(-1, S))
        z_mid = 0.5 * (depth_values[..., 1:] + depth_values[..., :-1])
        z_samples = sampling.sample_pdf(
            z_mid.reshape(-1, S - 1),
            flat_w[..., 1:-1],
            S,
            key=key_fine,
        ).reshape(B, H, W, S)
        if sort_fine and key_fine is not None:
            # Randomized inverse-CDF draws are NOT depth-ordered (the
            # uniforms are unsorted); the dual-list compositor requires
            # each list individually sorted. A per-ray sort of S depths is
            # far cheaper than the reference's 2S merged sort +
            # per-channel gather (run.py:283-335). Deterministic mode
            # evaluates the CDF inverse at increasing quantiles — already
            # nondecreasing, so the sort is skipped.
            z_samples = jnp.sort(z_samples, axis=-1)
        z_samples = jax.lax.stop_gradient(z_samples)
        fine_points = (
            ray_origins[..., None, :]
            + ray_directions[..., None, :] * z_samples[..., :, None]
        )
        return z_samples, query(fine_points)

    if config.fine_sampling and config.merge_mode == "pairwise":
        z_samples, fine = fine_pass(sort_fine=True)
        fine_channels = {k: v for k, v in fine.items() if k != "sigma"}

        if "coords" in channels:
            channels["semantics"] = channels.pop("coords")
            fine_channels["semantics"] = fine_channels.pop("coords")

        out = compositing.composite_dual(
            sigma,
            depth_values,
            channels,
            fine["sigma"],
            z_samples,
            fine_channels,
            ray_directions,
            white_background=config.white_background,
        )
        return out, {"depth_values": depth_values}

    if config.fine_sampling:
        z_samples, fine = fine_pass(sort_fine=False)

        # Depth-sorted merge of coarse+fine. One argsort, then a SINGLE flat
        # global-index gather over all channels concatenated — per-channel
        # take_along_axis over the sample axis costs several slow gathers
        # (measured ~30% of a full fwd+bwd step).
        all_depths = jnp.concatenate((depth_values, z_samples), axis=-1)
        order = jnp.argsort(all_depths, axis=-1)
        S2 = all_depths.shape[-1]
        names = list(channels.keys())
        sigma_all = jnp.concatenate((sigma, fine["sigma"]), axis=-1)
        parts = [sigma_all[..., None], all_depths[..., None]]
        widths = [1, 1]
        for k in names:
            merged = jnp.concatenate((channels[k], fine[k]), axis=-2)
            parts.append(merged)
            widths.append(merged.shape[-1])
        stacked = jnp.concatenate(parts, axis=-1)  # [B, H, W, 2S, Call]
        c_all = stacked.shape[-1]
        flat = stacked.reshape(-1, c_all)
        row_offset = (
            jnp.arange(B * H * W, dtype=jnp.int32)[:, None] * S2
        )
        gidx = (order.reshape(B * H * W, S2) + row_offset).reshape(-1)
        sorted_flat = jnp.take(flat, gidx, axis=0, mode="clip").reshape(
            B, H, W, S2, c_all
        )
        sigma = sorted_flat[..., 0]
        depth_values = sorted_flat[..., 1]
        ofs = 2
        for k, w_k in zip(names, widths[2:]):
            channels[k] = sorted_flat[..., ofs : ofs + w_k]
            ofs += w_k

    semantics = channels.get("semantics")
    if "coords" in channels:
        # Reference overloads the semantic slot with canonical coordinates
        # when compute_coords is requested (run.py:337-338).
        semantics = channels["coords"]

    out = compositing.render_volume_density(
        sigma,
        channels["rgb"],
        ray_directions,
        depth_values,
        channels.get("normals"),
        semantics,
        white_background=config.white_background,
    )
    aux = {"depth_values": depth_values}
    return out, aux


def make_field_fn(model, variables, planes, attention_values=None):
    """Binds Generator.sample_field over fixed synthesized planes.

    The returned field_fn(points, outputs[, viewdir_embedding]) takes the
    optional view-direction embedding PER POINT ([B, N, F']) so the caller
    can chunk it together with the points."""

    def field_fn(points, outputs, viewdir_embedding=None, splat_spec=None):
        return model.apply(
            variables,
            planes,
            points,
            attention_values=attention_values,
            viewdir_embedding=viewdir_embedding,
            outputs=outputs,
            splat_spec=splat_spec,
            method="sample_field",
        )

    return field_fn


def render(
    config: RenderConfig,
    model,
    variables,
    tform_cam2world: jnp.ndarray,
    focal_length: Optional[jnp.ndarray],
    latent: jnp.ndarray,
    center: Optional[jnp.ndarray] = None,
    bbox: Optional[jnp.ndarray] = None,
    key: Optional[jax.Array] = None,
    label: Optional[jnp.ndarray] = None,
    image: Optional[jnp.ndarray] = None,
    height: Optional[int] = None,
    width: Optional[int] = None,
    force_no_cam_grad: bool = False,
    noise_mode: str = "none",
    attention_values_override: Optional[jnp.ndarray] = None,
    attention_values_bias: Optional[jnp.ndarray] = None,
) -> Tuple[compositing.CompositeOutput, Dict[str, Any]]:
    """Full render from latents + camera (reference render(), run.py:176-350).

    `latent` follows the reference convention: [B, z_dim] is mapped through
    the mapping network; [B, 1, w_dim] broadcasts one w to all layers;
    [B, num_ws, w_dim] is used as-is.
    """
    ray_origins, ray_directions, near, far = prepare_rays(
        config, tform_cam2world, focal_length, center, bbox, height, width
    )

    key_noise, key_render = (
        jax.random.split(key) if key is not None else (None, None)
    )

    if latent.ndim == 3:
        if latent.shape[1] == 1:
            ws = jnp.broadcast_to(
                latent, (latent.shape[0], model.num_ws, latent.shape[2])
            )
        else:
            ws = latent
    else:
        ws = model.apply(variables, latent, label, image, method="mapping")

    planes = model.apply(
        variables, ws, noise_mode, key_noise, method="synthesize"
    )
    if config.plane_splat:
        # The fused-splat op casts and corner-packs per field query (cheap
        # relative to the gathers); the decoder needs the RAW planes so the
        # backward can produce unpacked plane gradients directly. Queries
        # whose geometry doesn't tile (splat_spec None at call time, e.g.
        # non-row-aligned chunks of a demo render) fall back to the
        # raw-plane grid-sample branch in TriplanarDecoder.
        field_planes = planes
    elif config.pack_planes:
        from nerf_from_image_tpu.ops.triplane import pack_corners

        field_planes = planes
        if config.plane_dtype is not None:
            field_planes = field_planes.astype(config.plane_dtype)
        field_planes = pack_corners(field_planes)
    else:
        field_planes = planes
    attention_values = None
    if model.attention_values > 0:
        if attention_values_override is not None:
            attention_values = attention_values_override
        else:
            attention_values = model.apply(variables, ws, method="texture")
            if attention_values_bias is not None:
                attention_values = attention_values + attention_values_bias

    viewdir_embedding = None
    if config.use_viewdir:
        B, H, W, _ = ray_directions.shape
        dirs_for_view = (
            jax.lax.stop_gradient(ray_directions)
            if force_no_cam_grad
            else ray_directions
        )
        # force_no_cam_grad must also detach the view-direction path (the
        # reference detaches ray_directions before building viewdirs,
        # run.py:211-219).
        viewdirs = dirs_for_view.reshape(B, H * W, 1, 3)
        # [B, H*W, 1, F'] -> per-ray [B, H*W, F']; render_field expands it
        # per point so it chunks alongside the query points.
        viewdir_embedding = model.apply(
            variables, viewdirs, method="viewdir_embedding"
        )[:, :, 0, :]

    field_fn = make_field_fn(
        model, variables, field_planes, attention_values
    )
    out, aux = render_field(
        config,
        field_fn,
        ray_origins,
        ray_directions,
        near,
        far,
        key=key_render,
        force_no_cam_grad=force_no_cam_grad,
        viewdir_embedding=viewdir_embedding,
    )
    if config.zbuffer_depth:
        from nerf_from_image_tpu.pose.pose import invert_space

        w2c = invert_space(tform_cam2world)
        view_dirs = jnp.sum(
            ray_directions[..., None, :] * w2c[:, None, None, :3, :3], axis=-1
        )
        zdepth = -(view_dirs[..., -1] * out.depth)
        out = out._replace(depth=zdepth)
    aux["ws"] = ws
    aux["planes"] = planes
    if attention_values is not None:
        aux["attention_values"] = attention_values
    return out, aux
