"""Pallas TPU kernels.

ops/pallas/splat.py — the backward of triplane bilinear sampling as a
ray-coherent windowed-matmul splat (see its module docstring for the
algorithm). As of round 4 the kernel SHIPS in bench.py's primary
configuration with full (ws, pose) gradients, unchunked, at B=4:
196,489 rays/s vs the round-3 scatter path's 106,900 (1.84x; 16.74x the
round-1 fixed baseline). Everything below is the measured story of how,
superseding the round-2/3 memos.

One truth about the round-3 "crash": it was the worker's OOM behavior.
jit(...).compile().memory_analysis() on the bench step: scatter backward
10.26 GiB temps / 10.29 peak — runs; splat full-gradient 10.55 GiB /
10.39 peak — killed the worker. Every configuration above ~10.3 GiB peak
dies (the axon tunnel kills the TPU worker instead of raising
RESOURCE_EXHAUSTED); everything below runs. The kernel itself was always
sound in context.

What fixed it (scripts/bench_step_config.py, all measured on the v5e):

* Compiler remat budget. XLA:TPU's rematerialization pass normalizes
  memory plans: storing vs re-gathering the dcoord residuals
  (splat_save_rows) produces DIFFERENT HLO but the IDENTICAL 10.39 GiB
  plan. Passing xla_jf_rematerialization_percent_shared_memory_limit=63
  makes the compiler remat the step to 9.65 GiB — and at that point the
  budget is not even binding (63 and 64 produce identical plans; 64+
  overshoots the kill line and dies). No measurable remat penalty
  remains in the final configuration.
* Window (128,128), block (16,16,4). The fine pass (surface-clustered
  samples) fits a (128,64) window at ~99%; the COARSE pass's stratified
  blocks span whole ray segments and overflow it (~6% of blocks — right
  at the misfit budget), which silently routed the whole coarse splat
  through the full-scatter fallback branch: 232 ms/step of hidden
  scatter in the profile. At (128,128) both passes stay on the fast
  branch (kernel ~40 ms/pass in context; per-pass misfits ~1%,
  residual-scattered within budget).
* Per-batch gather tables + scoped VMEM. The batch-flattened packed
  table ([B*H*W, 4C] bf16 = 67 MiB) is too big for memory-space-
  assignment to pin, and an HBM-resident-table gather runs at ~47
  Mrows/s vs ~260 Mrows/s VMEM-resident (profiled: 89 vs 15.6 ms for a
  4.2M-row pass). Splitting the forward's gathers per batch element
  (16.8 MiB tables — ops/triplane.sample_packed_with_rows
  per_batch_gather=True) and raising xla_tpu_scoped_vmem_limit_kib to
  90112 gets the tables pinned: 179k -> 196k rays/s. The sweep
  plateaus at 84-92 MiB; 104+ MiB and 32 MiB crash or regress.

Chunked-splat (the round-3 "production route") was measured end-to-end
and is NOT a perf path: 94.0k (16-row chunks) / 104.0k (32-row) / 77.9k
(64-row) rays/s — all below the 106.9k scatter baseline, because
jax.checkpoint's re-execution of the forward gathers dominates. It
remains correct and memory-lean (2.9-4.4 GiB temps) and is kept solely
as the fallback for smaller-HBM parts.

Round-5 window-sensitivity sweep (scripts/bench_step_config.py,
iters=16): at WX=128 the step is FLAT across WY 96..128 (199.0k /
198.4k / 198.2k / 197.6k rays/s for WY=96/104/112/128) — the splat's
MXU contraction largely overlaps with gathers/DMA, so shrinking the
window buys ~nothing — and below the footprint cliff it collapses to
the scatter fallback (WY=88: 124.4k; WX=112: 188.3k; any (th,tw)
halving of the 16x16 ray tile: ~121-124k). save_rows=0 with NO remat
cap lands on the identical 9.66 GiB plan and the identical 333 ms as
save_rows=1 + rematpct=63: the compiler's remat and the explicit
re-gather trade the same work. The shipped (128,128)+rematpct=63
config is therefore at a plateau whose next lever is structural
(fusing the forward gathers' consumer chain), not tunable.

Round-5 driver-path measurements: 30-step inversion at B=4
(scripts/profile_invert.py) — 10.195 s/img strict-f32, 6.108 bf16,
5.210 bf16+splat unchunked (the bench compiler options measure 5.395
on the inversion program — slightly WORSE; they are not used there).
Training g_step with the splat (scripts/profile_train.py, B=4):
plain splat OOMs; with the remat budget it fits (8.23 GiB at 63% /
9.02 GiB at 75%) but measures 875/865 ms vs the 840 ms chunked-bf16
baseline — NEUTRAL: the remat re-execution required to fit the
unchunked-splat G-step in HBM consumes the splat's saving. The
G-step wiring is correct (first-order: path_length differentiates
only the synthesis map, regularizers decode their own samples via
grid-sample; equivalence-tested) and stays opt-in.

Post-splat roofline at the shipped 333 ms step: the 6 mandatory per-pass
row gathers (3 planes x coarse+fine x 4.19M rows) floor the step at
~97 ms at the 260 Mrows/s VMEM gather wall; the splat windows add
~80 ms of MXU contraction ([WY,P]x[P,WX*C] per block). The residual
~155 ms is blocked transposes, per-sample compositing/sample_pdf work,
remat re-execution, and DMA — profiled per-op in scripts/profile_trace.py
(no single item above 25 ms/step remains).

Numerics: the splat accumulates in f32 where the scatter path it
replaced accumulated in bf16 (strictly better conditioned); exactness vs
the scatter reference ~2e-7 rel (f32 tables), ~4e-3 (bf16). All
kernel-correctness claims are green in tests/test_splat.py (CPU
interpret; 10/10 including the chunked and unchunked render-equivalence
tests). The chunked render-equivalence test compares at knife-edge-free
AABB geometry — at exact-face geometry the clip kink's subgradient
convention legitimately differs between independently compiled CPU
programs (+-1e-2 swing, bracketed in the test file's _SR_INNER note);
the TPU programs agree at ~2e-7 either way.

VMEM facts (round-3, still valid): pltpu.CompilerParams
(vmem_limit_bytes=100MB) compiles and runs — the 16 MB "limit" round 2
measured was only the compiler's default scoped cap. Full-plane-gradient
VMEM accumulators ([3, 256, 256*32] f32 = 25 MB) are resident across a
batch element's grid steps. Outputs are written via memory_space=ANY +
explicit DMA flush: on this platform a pallas VMEM-block output >= ~1 MB
inside a large XLA program crashes the worker (bisected in round 3;
HBM-space outputs via pltpu.make_async_copy are solid at any size).

Older round-2 measurements (still valid): forward gather row-rate wall
~300 Mrows/s (bf16, VMEM-resident tables), XLA scatter flat at ~57-68
Mrows/s regardless of index order/dtype/dedup, compositing/sample_pdf
rewritten as masked reductions at noise level, corner-FMA bf16 keeping
89.7k -> 106.8k rays/s fwd+bwd.
"""
