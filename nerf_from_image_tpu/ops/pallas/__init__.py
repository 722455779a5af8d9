"""Pallas TPU kernels.

Round 3 ships the first real kernel: ops/pallas/splat.py — the backward
of triplane bilinear sampling as a ray-coherent windowed-matmul splat
(see its module docstring for the algorithm). Measured on the v5e at
bench shapes (scripts/bench_splat.py): the fused 3-plane kernel covers
one full render pass in ~67 ms vs ~3 x 76 ms for the XLA scatter-adds it
replaces — 3.4x on the op that was 51% of the round-2 step. Exactness vs
the scatter reference: ~2e-7 rel (f32), ~4e-3 (bf16 — and the kernel
accumulates in f32 where the old path accumulated in bf16).

Two round-2 conclusions in the old memo are now CORRECTED:

* "VMEM is ~16 MB (16 MB scratch does not compile)" — that was only the
  compiler's default scoped cap. pltpu.CompilerParams(vmem_limit_bytes=
  100MB) compiles and runs; a direct probe allocates 120 MB of VMEM
  scratch successfully. This is what makes full-plane-gradient VMEM
  accumulators ([3, 256, 256*32] f32 = 25 MB) viable.
* "revisit only with an algorithmic reduction in scatter rows" — done:
  the windowed splat reduces dynamically-addressed rows by ~P (block
  size) per window store, exactly the lever the memo said was untried.

Outstanding platform issue (measured by bisection, scripts history in
git): on the axon-tunneled TPU, a pallas_call whose OUTPUT uses the
VMEM-block pipeline with blocks >= ~1 MB crashes the remote TPU worker
when the call is embedded in a large XLA program (standalone runs are
fine; a no-op kernel body with such outputs still crashes; a 4 KB output
is fine; HBM-space outputs written by explicit pltpu.make_async_copy
from VMEM scratch work even at 64 MB). splat.py therefore writes its
outputs via memory_space=ANY + DMA flush.

Round-3 isolation of the residual in-context crash (/tmp bisect scripts,
each stage run as its own TPU process):

* bench step, splat, query_chunk=None, grads wrt ws ONLY  -> runs,
  125,985 rays/s (vs 106.8k round-2 scatter baseline).
* same, grads wrt pose ONLY (splat kernel DCE'd)          -> runs, 264k.
* same, grads wrt (ws, pose), B=2                         -> runs, 88.9k
  (at half batch).
* same, grads wrt (ws, pose), B=4                         -> crashes the
  worker at first execution.

jit(...).compile().memory_analysis() temp sizes: scatter B=4 full
10.26 GB (runs), splat ws-only 6.98 GB (runs), splat full 10.55 GB
(crashes). Every crashing configuration sits above ~10.3 GB of XLA temps
and every running one below — i.e. the "crash" is this worker's
out-of-memory behavior (the axon tunnel kills the worker instead of
raising RESOURCE_EXHAUSTED), with ~10.3-10.5 GB of the 16 GB HBM usable
for temps. The kernel itself is sound in-context.

Consequence: plane_splat is also wired into the CHUNKED query path
(engine/render.py chunk_splat_spec) — a chunk that is a whole number of
image rows is itself a ray-coherent tile, so the windowed splat applies
per chunk while jax.checkpoint keeps the chunked path's memory bound
(residuals rematerialized). That configuration fits HBM at B=4 with full
gradients. All kernel-correctness claims above are green in
tests/test_splat.py (CPU interpret, incl. the chunked-splat render
equivalence) and scripts/bench_splat.py (TPU).

Older round-2 measurements (still valid): forward gather row-rate wall
~300 Mrows/s (bf16), XLA scatter flat at ~57-68 Mrows/s regardless of
index order/dtype/dedup, compositing/sample_pdf rewritten as masked
reductions at noise level, corner-FMA bf16 keeping 89.7k -> 106.8k
rays/s fwd+bwd.
"""
