"""Pallas TPU kernels — currently empty by measurement, not omission.

Every hot op of the render step was profiled on v5e against its XLA
lowering (scripts/profile_render.py, scripts/profile_gather.py):

* Triplane row gathers: XLA's bulk gather moves (8,128) HBM tiles per row
  — 81 Mrows/s f32, 258 Mrows/s bf16 ≈ 330-530 GB/s of tile-amplified
  bandwidth. A Pallas alternative must either issue one DMA per row
  (descriptor overhead ~100-300 ns/row ⇒ 10x slower) or hold a plane in
  VMEM (8.4 MB f32 fits, but per-row dynamic loads serialize on the VPU at
  a few cycles/row ⇒ no faster). The win came from layout instead:
  corner-packing (4x fewer rows) and bf16 rows (3x rows/s), both pure XLA.
* Backward scatter-add: 65 Mrows/s ≈ 530 GB/s of read-modify-write tile
  traffic — already ~2/3 of HBM peak. Measured insensitive to BOTH index
  order (pre-sorted indices: 65.5 vs 65.7 Mrows/s random) and dtype (bf16
  rows: 61.6 Mrows/s) — the scatter is descriptor/row-rate bound, so
  point reordering and narrower rows buy nothing, and a VMEM-accumulating
  Pallas kernel would serialize on per-point dynamic indexing (no
  per-element VMEM gather/scatter on this generation). Revisit only with
  an algorithmic reduction in scatter rows.
* Compositing / sample_pdf / sort-merge: replaced by all-pairs masked
  reductions (ops/compositing.composite_dual; ops/sampling.sample_pdf's
  masked prefix-extrema, which removed a 188 ms/step take_along_axis
  chain) that XLA fuses into VPU loop fusions — measured at noise level
  after the rewrites (scripts/profile_sampling2.py).

VMEM on this chip is ~16 MB (probed: 1 MB scratch compiles, 16 MB does
not), which rules out VMEM-resident packed tables [65536, 128] f32/bf16.

Round-2 re-check with an op-level trace (scripts/profile_trace.py, v5e,
bench config bf16/chunk=None, 727 ms/step): the six backward scatter-add
fusions (3 planes x 2 passes, each bf16[4xHW,128] <- 4.2M update rows)
account for ~368 ms/step at ~68 Mrows/s; forward gathers ~46 ms; decoder
FMA/MLP fusions ~60 ms; sampling/compositing ~25 ms; synthesis ~30 ms.
A VMEM-accumulating Pallas scatter was re-derived and rejected again:
the f32 table (33.5 MB) exceeds VMEM, so tiling forces re-streaming the
6 GB of update rows per tile pass (~same HBM traffic as XLA's RMW), and
channel-tiling reads the same full tiles. Batch scaling was also measured
(scripts/bench_batch_sweep.py): B=6/8 unchunked OOM, and the chunked-remat
fallback at B>=8 drops to ~52 krays/s — B=4 unchunked is the optimum.

Round-2 scatter re-derivations (all measured on the v5e, 4.2M update
rows -> bf16[262144, 128]):
* XLA scatter-add cost is FLAT at ~73 ms regardless of index
  distribution — random 74.2, pre-sorted 71.9, ALL-ZERO 73.4, half
  redirected to one dummy row 71.5, pairwise-duplicated 71.5. It is a
  pure per-row descriptor wall (~57 Mrows/s), not tile-RMW bandwidth:
  dedup/compaction tricks that leave the row count unchanged (dummy-row
  redirection) buy exactly nothing; only FEWER rows would help, and the
  row count is fixed by the sampling config.
* Sort + segment-matmul Pallas scatter (bin updates by sorted table row,
  accumulate each tile with an MXU one-hot matmul): sort_key_val of
  8.4M i32 keys is fine (23.6 ms) but the permutation gather of the
  [8.4M, 128] bf16 update rows costs 92 ms — together they match the
  plain scatter per plane-pair before the kernel even runs. Dead unless
  the updates can be PRODUCED in sorted order, which they can't (the 3
  planes need mutually incompatible orders).

What did work in round 2 (both pure layout/dtype, no kernels): doing the
corner-FMA reduction in bf16 when the tables are bf16 — XLA otherwise
materializes (and stores as residuals) f32[N,128] converts of the
gathered rows, ~3x the bytes of the FMA output — and keeping the tiny
decoder-MLP intermediates bf16. 89.7k -> 106.8k rays/s fwd+bwd.

Decoder reformulations were also measured and rejected
(scripts/profile_decoder.py): at query-chunk granularity the per-plane
corner FMA, a single 12-term fused FMA, and a corner-scaled [N, 384]
tiled-matmul variant (which avoids every 4x-padded [N, 32] intermediate)
are within ~5% of each other — XLA already fuses the FMA chain inside the
chunked remat body; the [N, 32] T(8,128) padding blowup only bites in
unchunked programs (where it OOMs the backward outright — query_chunk is
load-bearing, see RenderConfig).
"""
