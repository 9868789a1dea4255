"""Pallas TPU kernel: streaming segment row-sum over sorted runs.

``segment_rowsum(g, seg, U)`` computes ``acc[u] = sum_{i: seg[i]==u} g[i]``
for row-matrix ``g: (N, W)`` and **sorted non-decreasing** ``seg: (N,)``.

Why: the dedup SGD paths need per-unique-row gradient sums. XLA's
scatter-add costs ~14-23 ns/row into a 64K-row table (measured on v5e —
9-15 ms for a 639K-slot Criteo batch), because each row is a dynamic
update. With slots sorted by id (which the dedup plan already produces),
segments are contiguous runs, and the reduction becomes a *streaming*
pass:

  * grid steps walk (T, W) tiles of g sequentially (TPU grids execute
    in order on the core),
  * within a tile, per-rank sums are one (T, T) one-hot matmul on the
    MXU: ``partial[j] = sum_i [local_rank[i] == j] * g[i]``,
  * local ranks map to a *contiguous* global rank window [r0, r0+T), so
    the tile's result is ONE dense DMA to ``out[r0:r0+T]`` — no scatter,
  * a VMEM carry row threads the sum of a run that spans tile
    boundaries into the next tile (added at its local rank 0), and a
    tile whose ranks were partially overwritten by a later tile is
    always re-written completely by that tile (ranks windows are
    non-decreasing), so the last writer of every rank writes its
    complete sum.

Cost ≈ read g once + write out once + N*T*W MXU MACs: ~1 ms for
(639K, 128) at T=512 vs ~15 ms for the XLA scatter-add it replaces.

Contract (Pallas path): seg must be **dense ranks** — sorted, starting
at 0, incrementing by at most 1 between consecutive elements (exactly
what ``ops.embedding.dedup_ids`` produces as ``seg``). This bounds a
tile's local ranks to [0, T) so the one-hot matmul covers them; sorted
ids with arbitrary jumps would need unbounded windows (use the XLA
fallback for those). Values in [0, num_segments); ranks above seg[-1]
(unused budget) are zero-filled by the wrapper.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _segsum_kernel(seg_smem, g_ref, seg_vmem, out_ref,
                   carry, prev_rl, buf, sem):
    t = g_ref.shape[0]
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)
        prev_rl[0] = -1

    r0 = seg_smem[0]
    rl = seg_smem[t - 1]

    # seg streams as a 1-D block (dense HBM layout — a (N, 1) column
    # would be lane-padded 128x by XLA tiling); relayout on-chip.
    local = (seg_vmem[...] - r0).reshape(t, 1)                # (T, 1) i32
    g = g_ref[...]                                            # (T, W)

    # one-hot (slots x local-ranks): M2[i, j] = [local[i] == j]
    iota_rank = jax.lax.broadcasted_iota(jnp.int32, (t, t), 1)
    m2 = (local == iota_rank).astype(g.dtype)                 # (T, T)
    # partial[j, w] = sum_i m2[i, j] * g[i, w]  (contract dim 0 of both).
    # precision=HIGHEST is load-bearing: at default precision the TPU MXU
    # runs ONE bf16 pass over f32 operands, silently rounding g to 8
    # mantissa bits (~2^-8 relative error on every sum — measured on v5e;
    # interpret mode is exact, so only hardware runs see it).
    partial = jax.lax.dot_general(
        m2, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)                  # (T, W)

    # thread the carry of a run spanning the tile boundary into rank 0
    continuing = r0 == prev_rl[0]
    row0 = (jax.lax.broadcasted_iota(jnp.int32, (t, 1), 0) == 0)
    carry_in = jnp.where(continuing, 1.0, 0.0) * carry[...]
    partial = partial + jnp.where(row0, 1.0, 0.0) * carry_in

    # new carry: complete prefix sum of the run containing the last slot
    last_mask = local == (rl - r0)
    run_sum = jnp.sum(jnp.where(last_mask, g, 0.0), axis=0,
                      keepdims=True)                          # (1, W)
    whole_tile_one_run = jnp.logical_and(continuing, rl == r0)
    carry[...] = run_sum + jnp.where(whole_tile_one_run, 1.0, 0.0) * carry_in
    prev_rl[0] = rl

    buf[...] = partial
    cp = pltpu.make_async_copy(buf, out_ref.at[pl.ds(r0, t)], sem)
    cp.start()
    cp.wait()


@functools.partial(jax.jit,
                   static_argnames=("num_segments", "tile", "interpret"))
def _segment_rowsum_pallas(g: jnp.ndarray, seg: jnp.ndarray,
                           num_segments: int, tile: int = 1024,
                           interpret: bool = False) -> jnp.ndarray:
    n, w = g.shape
    assert n % tile == 0, (n, tile)
    out = pl.pallas_call(
        _segsum_kernel,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile,), lambda i: (i,),
                         memory_space=pltpu.SMEM),            # seg scalars
            pl.BlockSpec((tile, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),            # g tile
            pl.BlockSpec((tile,), lambda i: (i,),
                         memory_space=pltpu.VMEM),            # seg 1-D
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((1, w), jnp.float32),                  # carry
            pltpu.SMEM((1,), jnp.int32),                      # prev_rl
            pltpu.VMEM((tile, w), jnp.float32),               # out staging
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct((num_segments + tile, w),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(seg, g, seg)
    return out[:num_segments]


def _segsum_sq_kernel(subtile: int, bf16x2: bool,
                      seg_smem, g_ref, seg_vmem, out_ref,
                      carry, prev_rl, buf, sem):
    """Streaming [Σg | Σg²] over sorted dense ranks.

    Same contract and carry discipline as :func:`_segsum_kernel`, two
    upgrades for the train-step hot path:

      * squares are formed IN-KERNEL: the input is the narrow (T, W)
        gradient and the output is (U, 2W) [sums | sums of squares] — the
        caller never materializes (N, 2W) in HBM (halves input traffic vs
        packing squares outside).
      * the one-hot reduction runs on SUB-TILES of `subtile` rows: a
        (S, S) x (S, 2W) matmul per sub-tile instead of one (T, T) x
        (T, 2W) — MXU MACs per slot scale with S, not T (T=1024 is forced
        by the SMEM layout of the seg block, but nothing forces the
        contraction to be that wide). Run sums crossing a sub-tile
        boundary ride the same carry + "last writer writes the complete
        rank" discipline, applied per sub-tile window.
      * optional bf16x2: each operand column is split hi/lo
        (hi = bf16(x), lo = bf16(x - hi)) and reduced with two bf16 MXU
        passes accumulated in f32 — ~3x fewer MXU passes than native f32
        at ~2e-4 max relative error measured at Criteo shapes on v5e
        (the one-hot matrix is exact in bf16).
    """
    t = g_ref.shape[0]
    w = g_ref.shape[1]
    wpad = carry.shape[1] - 2 * w     # zero lanes up to the 128 DMA tile
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)
        prev_rl[0] = -1

    r0 = seg_smem[0]

    g_all = g_ref[...]                                        # (T, W)
    n_sub = t // subtile

    for si in range(n_sub):
        s0 = si * subtile
        rs0 = seg_smem[s0]
        rsl = seg_smem[s0 + subtile - 1]
        local = (seg_vmem[s0:s0 + subtile] - rs0
                 ).reshape(subtile, 1)                        # (S, 1)
        g = g_all[s0:s0 + subtile, :]                         # (S, W)
        gg = jnp.concatenate(
            [g, g * g,
             jnp.zeros((subtile, wpad), jnp.float32)], axis=1)  # (S, 2W+pad)

        iota_rank = jax.lax.broadcasted_iota(
            jnp.int32, (subtile, subtile), 1)
        m2 = (local == iota_rank)
        if bf16x2:
            m2b = m2.astype(jnp.bfloat16)
            hi = gg.astype(jnp.bfloat16)
            lo = (gg - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            partial = jax.lax.dot_general(
                m2b, hi, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            partial = partial + jax.lax.dot_general(
                m2b, lo, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            # HIGHEST precision: default lowers f32 MXU dots to one bf16
            # pass (~2^-8 error; see _segsum_kernel). The bf16x2 branch
            # handles its own precision via the hi/lo split.
            partial = jax.lax.dot_general(
                m2.astype(jnp.float32), gg,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)          # (S, 2W)

        continuing = rs0 == prev_rl[0]
        row0 = (jax.lax.broadcasted_iota(
            jnp.int32, (subtile, 1), 0) == 0)
        carry_in = jnp.where(continuing, 1.0, 0.0) * carry[...]
        partial = partial + jnp.where(row0, 1.0, 0.0) * carry_in

        # exact f32 carry: complete sum of the run containing the last slot
        last_mask = local == (rsl - rs0)
        run_sum = jnp.sum(jnp.where(last_mask, gg, 0.0), axis=0,
                          keepdims=True)                      # (1, 2W)
        whole_one_run = jnp.logical_and(continuing, rsl == rs0)
        carry[...] = run_sum + jnp.where(whole_one_run, 1.0, 0.0) * carry_in
        prev_rl[0] = rsl

        # stage into the block-local rank window [rs0 - r0, rs0 - r0 + S)
        # (rs0 - r0 <= s0, so the window fits in the (T, 2W) buf);
        # overlapping boundary ranks are rewritten complete by the later
        # sub-tile (ranks are non-decreasing), same as across blocks.
        buf[pl.ds(rs0 - r0, subtile), :] = partial

    # one DMA for the whole block's rank window (<= t ranks); rows past
    # this block's last rank hold garbage and are always rewritten by the
    # next block's window (or masked by the wrapper past seg[-1]).
    cp = pltpu.make_async_copy(
        buf.at[pl.ds(0, t)], out_ref.at[pl.ds(r0, t)], sem)
    cp.start()
    cp.wait()


@functools.partial(
    jax.jit, static_argnames=("num_segments", "tile", "subtile", "bf16x2",
                              "interpret"))
def _segment_rowsum_sq_pallas(g: jnp.ndarray, seg: jnp.ndarray,
                              num_segments: int, tile: int = 1024,
                              subtile: int = 256, bf16x2: bool = True,
                              interpret: bool = False) -> jnp.ndarray:
    n, w = g.shape
    assert n % tile == 0 and tile % subtile == 0, (n, tile, subtile)
    # lane-pad the staged payload to the 128 DMA tile (Mosaic requires
    # memref slices 128-aligned on the lane dim)
    w_out = ((2 * w + 127) // 128) * 128
    kern = functools.partial(_segsum_sq_kernel, subtile, bf16x2)
    out = pl.pallas_call(
        kern,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile,), lambda i: (i,),
                         memory_space=pltpu.VMEM),            # seg 1-D
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((1, w_out), jnp.float32),              # carry
            pltpu.SMEM((1,), jnp.int32),                      # prev_rl
            pltpu.VMEM((tile, w_out), jnp.float32),           # buf window
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct((num_segments + tile, w_out),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(seg, g, seg)
    return out[:num_segments, :2 * w]


def segment_rowsum_sq(g: jnp.ndarray, seg: jnp.ndarray, num_segments: int,
                      tile: int = 1024, subtile: int = 256,
                      bf16x2: bool = True,
                      force: str = "auto") -> jnp.ndarray:
    """[Σg | Σg²] per segment of sorted dense ranks: (N, W) -> (U, 2W).

    The hybrid sorted-backward step's reduction (solvers/sgd_hybrid.py).
    force: auto|pallas|xla|interpret; the XLA fallback (and non-TPU auto)
    is an exact-f32 segment_sum of the packed [g | g²]. bf16x2 applies to
    the Pallas path only (~2e-4 max relative error on sums; set False for
    the exact-f32 kernel).
    """
    from sparkfm_tpu.ops.pallas_rowio import use_pallas_rowio
    if force == "xla" or (force == "auto" and not use_pallas_rowio()):
        packed = jnp.concatenate([g, jnp.square(g)], axis=1)
        return jax.ops.segment_sum(packed, seg, num_segments=num_segments)

    interpret = force == "interpret"
    n, w = g.shape
    pad_n = (-n) % tile
    if pad_n:
        g = jnp.concatenate(
            [g, jnp.zeros((pad_n, w), g.dtype)], axis=0)
        seg = jnp.concatenate(
            [seg, jnp.broadcast_to(seg[-1:], (pad_n,))])
    out = _segment_rowsum_sq_pallas(
        g.astype(jnp.float32), seg.astype(jnp.int32), num_segments,
        tile=tile, subtile=subtile, bf16x2=bf16x2, interpret=interpret)
    rank = jax.lax.iota(jnp.int32, num_segments)
    valid = jnp.logical_and(rank >= seg[0], rank <= seg[-1])
    return jnp.where(valid[:, None], out, 0.0)


def _fm_grad_segsum_kernel(subtile: int, bf16x2: bool, k: int,
                           seg_smem, coef_smem, vw_ref, ex_ref, x_ref,
                           seg_vmem, out_ref, carry, prev_rl, buf, sem):
    """Fused FM backward elementwise + [Σg | Σg²] streaming reduce.

    The hybrid step's backward (solvers/sgd_hybrid.py) evaluates the
    closed-form FM gradient in id-sorted slot order and reduces runs.
    Doing the elementwise OUTSIDE the reduce kernel materializes the
    (N, k+1) gradient pack in HBM (write + read back ≈ 170 MB at Criteo
    shapes) and, measured in-step on v5e (benchmarks/ablate_hybrid.py),
    costs ~4.4 ms on top of the ~4.0 ms reduce. This kernel streams the
    *inputs* of the gradient formula instead and forms

        g_v[i] = ds_i x_i (s_i - v_i x_i) + cv * v_i * active_i
        g_w[i] = ds_i x_i + cw * w_i * active_i
        active_i = wt_i if x_i != 0 else 0

    on the VPU between the DMA-in and the one-hot MXU reduction — the
    gradients never exist in HBM. Same carry/sub-tile/last-writer
    discipline as :func:`_segsum_sq_kernel`; output rank r holds
    [Σg_v (k) | Σg_w | Σg_v² (k) | Σg_w² | 0-pad] over its run.

    coef_smem holds [cv, cw] = 2*reg/denom_reg (traced per-batch scalars).
    """
    t = vw_ref.shape[0]
    wout = carry.shape[1]
    wpad = wout - (2 * k + 2)
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)
        prev_rl[0] = -1

    r0 = seg_smem[0]
    cv = coef_smem[0]
    cw = coef_smem[1]
    n_sub = t // subtile

    for si in range(n_sub):
        s0 = si * subtile
        rs0 = seg_smem[s0]
        rsl = seg_smem[s0 + subtile - 1]
        # seg/x stream as 1-D blocks (dense packed HBM layout; a (N, 1)
        # column input would be lane-padded to 128 by XLA's tiling — a
        # measured ~325 MB/step of pure padding traffic each at Criteo
        # shapes). The (S,) -> (S, 1) relayout runs on-chip.
        local = (seg_vmem[s0:s0 + subtile] - rs0).reshape(subtile, 1)

        vw = vw_ref[s0:s0 + subtile, :]                       # (S, k+1)
        ex = ex_ref[s0:s0 + subtile, :]                       # (S, k+2)
        x = x_ref[s0:s0 + subtile].reshape(subtile, 1)        # (S, 1)
        v = vw[:, :k]
        w = vw[:, k:k + 1]
        s = ex[:, :k]
        ds = ex[:, k:k + 1]
        wt = ex[:, k + 1:k + 2]
        active = jnp.where(x != 0.0, wt, 0.0)                 # (S, 1)
        dsx = ds * x                                          # (S, 1)
        g_v = dsx * (s - v * x) + (cv * active) * v           # (S, k)
        g_w = dsx + (cw * active) * w                         # (S, 1)
        gg = jnp.concatenate(
            [g_v, g_w, g_v * g_v, g_w * g_w,
             jnp.zeros((subtile, wpad), jnp.float32)], axis=1)  # (S, wout)

        iota_rank = jax.lax.broadcasted_iota(
            jnp.int32, (subtile, subtile), 1)
        m2 = (local == iota_rank)
        if bf16x2:
            m2b = m2.astype(jnp.bfloat16)
            hi = gg.astype(jnp.bfloat16)
            lo = (gg - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            partial = jax.lax.dot_general(
                m2b, hi, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            partial = partial + jax.lax.dot_general(
                m2b, lo, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            # HIGHEST precision: see _segsum_kernel on the default's
            # silent bf16 degradation of f32 MXU dots.
            partial = jax.lax.dot_general(
                m2.astype(jnp.float32), gg,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)          # (S, wout)

        continuing = rs0 == prev_rl[0]
        row0 = (jax.lax.broadcasted_iota(
            jnp.int32, (subtile, 1), 0) == 0)
        carry_in = jnp.where(continuing, 1.0, 0.0) * carry[...]
        partial = partial + jnp.where(row0, 1.0, 0.0) * carry_in

        last_mask = local == (rsl - rs0)
        run_sum = jnp.sum(jnp.where(last_mask, gg, 0.0), axis=0,
                          keepdims=True)                      # (1, wout)
        whole_one_run = jnp.logical_and(continuing, rsl == rs0)
        carry[...] = run_sum + jnp.where(whole_one_run, 1.0, 0.0) * carry_in
        prev_rl[0] = rsl

        buf[pl.ds(rs0 - r0, subtile), :] = partial

    cp = pltpu.make_async_copy(
        buf.at[pl.ds(0, t)], out_ref.at[pl.ds(r0, t)], sem)
    cp.start()
    cp.wait()


@functools.partial(
    jax.jit, static_argnames=("num_segments", "k", "tile", "subtile",
                              "bf16x2", "interpret"))
def _fm_grad_segsum_pallas(vw: jnp.ndarray, ex: jnp.ndarray, x: jnp.ndarray,
                           seg: jnp.ndarray, coef: jnp.ndarray,
                           num_segments: int, k: int, tile: int = 1024,
                           subtile: int = 256, bf16x2: bool = True,
                           interpret: bool = False) -> jnp.ndarray:
    n = vw.shape[0]
    assert n % tile == 0 and tile % subtile == 0, (n, tile, subtile)
    w_out = ((2 * k + 2 + 127) // 128) * 128
    kern = functools.partial(_fm_grad_segsum_kernel, subtile, bf16x2, k)
    out = pl.pallas_call(
        kern,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile,), lambda i: (i,),
                         memory_space=pltpu.SMEM),            # seg scalars
            pl.BlockSpec((2,), lambda i: (0,),
                         memory_space=pltpu.SMEM),            # [cv, cw]
            pl.BlockSpec((tile, k + 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),            # vw_srt
            pl.BlockSpec((tile, k + 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),            # ex_srt
            pl.BlockSpec((tile,), lambda i: (i,),
                         memory_space=pltpu.VMEM),            # x (svals) 1-D
            pl.BlockSpec((tile,), lambda i: (i,),
                         memory_space=pltpu.VMEM),            # seg 1-D
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((1, w_out), jnp.float32),              # carry
            pltpu.SMEM((1,), jnp.int32),                      # prev_rl
            pltpu.VMEM((tile, w_out), jnp.float32),           # buf window
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct((num_segments + tile, w_out),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(seg, coef, vw, ex, x, seg)
    return out[:num_segments, :2 * k + 2]


def fm_grad_segsum(vw_srt: jnp.ndarray, ex_srt: jnp.ndarray,
                   x: jnp.ndarray, seg: jnp.ndarray, num_segments: int,
                   cv, cw, *, tile: int = 1024, subtile: int = 256,
                   bf16x2: bool = True, force: str = "auto") -> jnp.ndarray:
    """FM sorted backward + per-unique reduce in one pass:
    (N, k+1) rows, (N, k+2) example pack, (N,) values -> (U, 2k+2)
    [Σg_v | Σg_w | Σg_v² | Σg_w²]. See _fm_grad_segsum_kernel.

    cv/cw are the per-batch L2 coefficients 2*reg/denom_reg (traced
    scalars). force: auto|pallas|xla|interpret; the XLA fallback (and
    non-TPU auto) materializes the gradient pack and segment_sums it —
    exact f32, used for parity tests.
    """
    k = vw_srt.shape[1] - 1
    v_srt = vw_srt[:, :k]
    w_srt = vw_srt[:, k]

    from sparkfm_tpu.ops.pallas_rowio import use_pallas_rowio
    if force == "xla" or (force == "auto" and not use_pallas_rowio()):
        s_srt, ds_srt, wt_srt = (ex_srt[:, :k], ex_srt[:, k],
                                 ex_srt[:, k + 1])
        active = jnp.where(x != 0, wt_srt, 0.0)
        dsx = ds_srt * x
        g_v = dsx[:, None] * (s_srt - v_srt * x[:, None]) \
            + (cv * active)[:, None] * v_srt
        g_w = dsx + cw * w_srt * active
        gpack = jnp.concatenate([g_v, g_w[:, None]], axis=1)
        packed = jnp.concatenate([gpack, jnp.square(gpack)], axis=1)
        return jax.ops.segment_sum(packed, seg, num_segments=num_segments)

    interpret = force == "interpret"
    n = vw_srt.shape[0]
    pad_n = (-n) % tile
    if pad_n:
        zrow = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad_n,) + a.shape[1:], a.dtype)], axis=0)
        vw_srt, ex_srt, x = zrow(vw_srt), zrow(ex_srt), zrow(x)
        seg = jnp.concatenate([seg, jnp.broadcast_to(seg[-1:], (pad_n,))])
    coef = jnp.stack([jnp.asarray(cv, jnp.float32),
                      jnp.asarray(cw, jnp.float32)])
    out = _fm_grad_segsum_pallas(
        vw_srt.astype(jnp.float32), ex_srt.astype(jnp.float32),
        x.astype(jnp.float32), seg.astype(jnp.int32), coef,
        num_segments, k, tile=tile, subtile=subtile, bf16x2=bf16x2,
        interpret=interpret)
    rank = jax.lax.iota(jnp.int32, num_segments)
    valid = jnp.logical_and(rank >= seg[0], rank <= seg[-1])
    return jnp.where(valid[:, None], out, 0.0)


def _fm_grad_factored_kernel(subtile: int, bf16x2: bool, k: int,
                             seg_smem, coef_smem, ex_ref, x_ref,
                             seg_vmem, out_ref, carry, prev_rl, buf, sem):
    """Factored FM backward: the unique row V_u never enters the stream.

    Within a run (all slots sharing one unique id) the row v is CONSTANT,
    so it factors out of both gradient sums analytically:

        g_v[i] = t1_i - t2_i * v        t1 = ds*x*s,  t2 = ds*x*x - cv*a
        Σg_v   = Σt1 - (Σt2) ⊙ V_u
        Σg_v²  = Σt1² - 2 V_u ⊙ Σ(t1 t2) + V_u² ⊙ Σt2²
        g_w[i] = dsx_i + cw*a_i*w   →  Σg_w  = Σdsx + cw W_u Σa
                                       Σg_w² = Σdsx² + 2cw W_u Σ(dsx a)
                                               + cw² W_u² Σa²

    so the kernel reduces ONLY example-derived payloads — the (N, k+1)
    id-sorted row stream (and the ~2 ms gather that produced it,
    solvers/sgd_hybrid.py round 3) is gone; a (U, k)-sized combine with
    the already-VMEM-resident vw_u happens outside
    (:func:`fm_grad_segsum_factored`). Payload lanes per sorted slot:

        [t1 (k) | t1² (k) | t1·t2 (k) | t2 | t2² | dsx | dsx² | dsx·a
         | a² | a | 0-pad]                         width 3k+7 -> pad 128

    Same carry/sub-tile/last-writer discipline as _segsum_sq_kernel.
    """
    t = ex_ref.shape[0]
    wout = carry.shape[1]
    wpad = wout - (3 * k + 7)
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)
        prev_rl[0] = -1

    r0 = seg_smem[0]
    cv = coef_smem[0]
    n_sub = t // subtile

    for si in range(n_sub):
        s0 = si * subtile
        rs0 = seg_smem[s0]
        rsl = seg_smem[s0 + subtile - 1]
        local = (seg_vmem[s0:s0 + subtile] - rs0).reshape(subtile, 1)

        ex = ex_ref[s0:s0 + subtile, :]                       # (S, k+2)
        x = x_ref[s0:s0 + subtile].reshape(subtile, 1)        # (S, 1)
        s = ex[:, :k]
        ds = ex[:, k:k + 1]
        wt = ex[:, k + 1:k + 2]
        a = jnp.where(x != 0.0, wt, 0.0)                      # (S, 1)
        dsx = ds * x                                          # (S, 1)
        t1 = dsx * s                                          # (S, k)
        t2 = dsx * x - cv * a                                 # (S, 1)
        gg = jnp.concatenate(
            [t1, t1 * t1, t1 * t2, t2, t2 * t2, dsx, dsx * dsx,
             dsx * a, a * a, a,
             jnp.zeros((subtile, wpad), jnp.float32)], axis=1)  # (S, wout)

        iota_rank = jax.lax.broadcasted_iota(
            jnp.int32, (subtile, subtile), 1)
        m2 = (local == iota_rank)
        if bf16x2:
            m2b = m2.astype(jnp.bfloat16)
            hi = gg.astype(jnp.bfloat16)
            lo = (gg - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            partial = jax.lax.dot_general(
                m2b, hi, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            partial = partial + jax.lax.dot_general(
                m2b, lo, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            partial = jax.lax.dot_general(
                m2.astype(jnp.float32), gg,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)          # (S, wout)

        continuing = rs0 == prev_rl[0]
        row0 = (jax.lax.broadcasted_iota(
            jnp.int32, (subtile, 1), 0) == 0)
        carry_in = jnp.where(continuing, 1.0, 0.0) * carry[...]
        partial = partial + jnp.where(row0, 1.0, 0.0) * carry_in

        last_mask = local == (rsl - rs0)
        run_sum = jnp.sum(jnp.where(last_mask, gg, 0.0), axis=0,
                          keepdims=True)                      # (1, wout)
        whole_one_run = jnp.logical_and(continuing, rsl == rs0)
        carry[...] = run_sum + jnp.where(whole_one_run, 1.0, 0.0) * carry_in
        prev_rl[0] = rsl

        buf[pl.ds(rs0 - r0, subtile), :] = partial

    cp = pltpu.make_async_copy(
        buf.at[pl.ds(0, t)], out_ref.at[pl.ds(r0, t)], sem)
    cp.start()
    cp.wait()


@functools.partial(
    jax.jit, static_argnames=("num_segments", "k", "tile", "subtile",
                              "bf16x2", "interpret"))
def _fm_grad_factored_pallas(ex: jnp.ndarray, x: jnp.ndarray,
                             seg: jnp.ndarray, coef: jnp.ndarray,
                             num_segments: int, k: int, tile: int = 1024,
                             subtile: int = 256, bf16x2: bool = True,
                             interpret: bool = False) -> jnp.ndarray:
    n = ex.shape[0]
    assert n % tile == 0 and tile % subtile == 0, (n, tile, subtile)
    w_out = ((3 * k + 7 + 127) // 128) * 128
    kern = functools.partial(_fm_grad_factored_kernel, subtile, bf16x2, k)
    out = pl.pallas_call(
        kern,
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile,), lambda i: (i,),
                         memory_space=pltpu.SMEM),            # seg scalars
            pl.BlockSpec((2,), lambda i: (0,),
                         memory_space=pltpu.SMEM),            # [cv, cw]
            pl.BlockSpec((tile, k + 2), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),            # ex_srt
            pl.BlockSpec((tile,), lambda i: (i,),
                         memory_space=pltpu.VMEM),            # x (svals) 1-D
            pl.BlockSpec((tile,), lambda i: (i,),
                         memory_space=pltpu.VMEM),            # seg 1-D
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((1, w_out), jnp.float32),              # carry
            pltpu.SMEM((1,), jnp.int32),                      # prev_rl
            pltpu.VMEM((tile, w_out), jnp.float32),           # buf window
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct((num_segments + tile, w_out),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(seg, coef, ex, x, seg)
    return out[:num_segments, :3 * k + 7]


def fm_grad_segsum_factored(vw_u: jnp.ndarray, ex_srt: jnp.ndarray,
                            x: jnp.ndarray, seg: jnp.ndarray,
                            num_segments: int, cv, cw, *,
                            tile: int = 1024, subtile: int = 256,
                            bf16x2: bool = True,
                            force: str = "auto") -> jnp.ndarray:
    """Drop-in replacement for :func:`fm_grad_segsum` that never streams
    the (N, k+1) sorted row matrix: per-run sums of example-derived
    payloads (see _fm_grad_factored_kernel) are combined with the
    (U, k+1) unique rows OUTSIDE the kernel. Returns the same
    (U, 2k+2) [Σg_v | Σg_w | Σg_v² | Σg_w²].

    vw_u: (num_segments, k+1) unique rows ALIGNED WITH seg's rank space
    (the single-chip plan's budget rows, or vw_u[gmap] per shard on the
    sharded path). force: auto|pallas|xla|interpret; the XLA fallback
    (and non-TPU auto) evaluates the direct unfactored formula — exact
    f32, bit-identical to fm_grad_segsum's fallback, so CPU parity tests
    are unchanged.

    Precision note (hardware, bf16x2=True): the squared-sum combine
    (Σt1² − 2V·Σt1t2 + V²·Σt2²) can amplify the ~2e-4 per-sum bf16x2
    error to ~1e-3 worst-case under cancellation; those sums feed the
    adagrad accumulator (rsqrt), where 0.1% is immaterial. bf16x2=False
    keeps everything ≤1e-4 at ~3x the MXU passes
    (tests/test_tpu_parity.py).
    """
    k = vw_u.shape[1] - 1
    from sparkfm_tpu.ops.pallas_rowio import use_pallas_rowio
    if force == "xla" or (force == "auto" and not use_pallas_rowio()):
        vw_srt = vw_u.at[seg].get(indices_are_sorted=True,
                                  mode="promise_in_bounds")
        return fm_grad_segsum(vw_srt, ex_srt, x, seg, num_segments, cv,
                              cw, tile=tile, subtile=subtile,
                              bf16x2=bf16x2, force="xla")

    interpret = force == "interpret"
    n = ex_srt.shape[0]
    pad_n = (-n) % tile
    if pad_n:
        zrow = lambda a: jnp.concatenate(
            [a, jnp.zeros((pad_n,) + a.shape[1:], a.dtype)], axis=0)
        ex_srt, x = zrow(ex_srt), zrow(x)
        seg = jnp.concatenate([seg, jnp.broadcast_to(seg[-1:], (pad_n,))])
    coef = jnp.stack([jnp.asarray(cv, jnp.float32),
                      jnp.asarray(cw, jnp.float32)])
    raw = _fm_grad_factored_pallas(
        ex_srt.astype(jnp.float32), x.astype(jnp.float32),
        seg.astype(jnp.int32), coef, num_segments, k, tile=tile,
        subtile=subtile, bf16x2=bf16x2, interpret=interpret)
    rank = jax.lax.iota(jnp.int32, num_segments)
    valid = jnp.logical_and(rank >= seg[0], rank <= seg[-1])
    raw = jnp.where(valid[:, None], raw, 0.0)

    # per-unique combine (U-sized elementwise; V_u/W_u from the resident
    # unique matrix)
    v_u = vw_u[:, :k]
    w_u = vw_u[:, k:k + 1]
    s_t1 = raw[:, :k]
    s_t1sq = raw[:, k:2 * k]
    s_t12 = raw[:, 2 * k:3 * k]
    s_t2 = raw[:, 3 * k:3 * k + 1]
    s_t2sq = raw[:, 3 * k + 1:3 * k + 2]
    s_dsx = raw[:, 3 * k + 2:3 * k + 3]
    s_dsxsq = raw[:, 3 * k + 3:3 * k + 4]
    s_dsxa = raw[:, 3 * k + 4:3 * k + 5]
    s_asq = raw[:, 3 * k + 5:3 * k + 6]
    s_a = raw[:, 3 * k + 6:3 * k + 7]
    cwf = jnp.asarray(cw, jnp.float32)
    g_v = s_t1 - s_t2 * v_u
    sq_v = s_t1sq - 2.0 * v_u * s_t12 + jnp.square(v_u) * s_t2sq
    g_w = s_dsx + cwf * w_u * s_a
    sq_w = (s_dsxsq + 2.0 * cwf * w_u * s_dsxa
            + jnp.square(cwf * w_u) * s_asq)
    return jnp.concatenate([g_v, g_w, sq_v, sq_w], axis=1)


def _segsum_streams_kernel(subtile: int, bf16x2: bool, n_streams: int,
                           seg_smem, *refs):
    """Streaming per-rank sums of ``n_streams`` 1-D value streams.

    refs = (stream_0, ..., stream_{n-1}, seg_vmem, out_ref,
            carry, prev_rl, buf, sem). Payload lane j of sorted slot i is
    streams[j][i]; the reduction/carry discipline is _segsum_sq_kernel's.
    1-D streams lay out densely in HBM (no (N, 1) 128x lane-padding tax),
    which is the whole point — the ALS sweep's per-feature sums are
    five scalar streams per coordinate block (solvers/als.py round 4).
    """
    streams = refs[:n_streams]
    seg_vmem, out_ref, carry, prev_rl, buf, sem = refs[n_streams:]
    t = seg_vmem.shape[0]
    wout = carry.shape[1]
    wpad = wout - n_streams
    pid = pl.program_id(0)

    @pl.when(pid == 0)
    def _():
        carry[...] = jnp.zeros_like(carry)
        prev_rl[0] = -1

    r0 = seg_smem[0]
    n_sub = t // subtile

    for si in range(n_sub):
        s0 = si * subtile
        rs0 = seg_smem[s0]
        rsl = seg_smem[s0 + subtile - 1]
        local = (seg_vmem[s0:s0 + subtile] - rs0).reshape(subtile, 1)

        cols = [s[s0:s0 + subtile].reshape(subtile, 1) for s in streams]
        gg = jnp.concatenate(
            cols + [jnp.zeros((subtile, wpad), jnp.float32)], axis=1)

        iota_rank = jax.lax.broadcasted_iota(
            jnp.int32, (subtile, subtile), 1)
        m2 = (local == iota_rank)
        if bf16x2:
            m2b = m2.astype(jnp.bfloat16)
            hi = gg.astype(jnp.bfloat16)
            lo = (gg - hi.astype(jnp.float32)).astype(jnp.bfloat16)
            partial = jax.lax.dot_general(
                m2b, hi, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            partial = partial + jax.lax.dot_general(
                m2b, lo, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            partial = jax.lax.dot_general(
                m2.astype(jnp.float32), gg,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)

        continuing = rs0 == prev_rl[0]
        row0 = (jax.lax.broadcasted_iota(
            jnp.int32, (subtile, 1), 0) == 0)
        carry_in = jnp.where(continuing, 1.0, 0.0) * carry[...]
        partial = partial + jnp.where(row0, 1.0, 0.0) * carry_in

        last_mask = local == (rsl - rs0)
        run_sum = jnp.sum(jnp.where(last_mask, gg, 0.0), axis=0,
                          keepdims=True)
        whole_one_run = jnp.logical_and(continuing, rsl == rs0)
        carry[...] = run_sum + jnp.where(whole_one_run, 1.0, 0.0) * carry_in
        prev_rl[0] = rsl

        buf[pl.ds(rs0 - r0, subtile), :] = partial

    cp = pltpu.make_async_copy(
        buf.at[pl.ds(0, t)], out_ref.at[pl.ds(r0, t)], sem)
    cp.start()
    cp.wait()


@functools.partial(
    jax.jit, static_argnames=("num_segments", "n_streams", "tile",
                              "subtile", "bf16x2", "interpret"))
def _segment_colsums_pallas(stacked: jnp.ndarray, seg: jnp.ndarray,
                            num_segments: int, n_streams: int,
                            tile: int = 1024, subtile: int = 256,
                            bf16x2: bool = False,
                            interpret: bool = False) -> jnp.ndarray:
    n = seg.shape[0]
    assert n % tile == 0 and tile % subtile == 0, (n, tile, subtile)
    w_out = 128
    kern = functools.partial(_segsum_streams_kernel, subtile, bf16x2,
                             n_streams)
    out = pl.pallas_call(
        kern,
        grid=(n // tile,),
        in_specs=[pl.BlockSpec((tile,), lambda i: (i,),
                               memory_space=pltpu.SMEM)]      # seg scalars
        + [pl.BlockSpec((tile,), lambda i, _j=j: (i,),
                        memory_space=pltpu.VMEM)
           for j in range(n_streams)]                         # streams 1-D
        + [pl.BlockSpec((tile,), lambda i: (i,),
                        memory_space=pltpu.VMEM)],            # seg 1-D
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((1, w_out), jnp.float32),              # carry
            pltpu.SMEM((1,), jnp.int32),                      # prev_rl
            pltpu.VMEM((tile, w_out), jnp.float32),           # buf window
            pltpu.SemaphoreType.DMA,
        ],
        out_shape=jax.ShapeDtypeStruct((num_segments + tile, w_out),
                                       jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(seg, *[stacked[j] for j in range(n_streams)], seg)
    return out[:num_segments, :n_streams]


def segment_colsums(streams, seg: jnp.ndarray, num_segments: int,
                    tile: int = 1024, subtile: int = 256,
                    bf16x2: bool = False,
                    force: str = "auto") -> jnp.ndarray:
    """Per-rank sums of up to ~16 scalar streams: ([(N,)] * S, sorted
    dense seg) -> (U, S). Column j = segment_sum(streams[j], seg).

    The ALS sweep's per-feature reductions (solvers/als.py) reduce five
    example-derived streams per coordinate block through this. seg must
    be dense sorted ranks (step <= 1) for the Pallas path; force:
    auto|pallas|xla|interpret (XLA fallback stacks the streams and
    segment_sums — exact f32, and the non-TPU auto).
    """
    from sparkfm_tpu.ops.pallas_rowio import use_pallas_rowio
    streams = tuple(streams)
    if force == "xla" or (force == "auto" and not use_pallas_rowio()):
        # one 1-D segment_sum per stream: stacking to (N, S) first lays
        # out T(8,128)-tiled (25.6x padding at S=5 — 25.6 GB at the full
        # ML-25M shape, a measured compile-time OOM); per-stream sums
        # are padding-free and exactly the same f32 reduction order
        return jnp.stack(
            [jax.ops.segment_sum(s, seg, num_segments=num_segments,
                                 indices_are_sorted=True)
             for s in streams], axis=1)
    interpret = force == "interpret"
    n = seg.shape[0]
    pad_n = (-n) % tile
    if pad_n:
        streams = tuple(
            jnp.concatenate([s, jnp.zeros((pad_n,), s.dtype)])
            for s in streams)
        seg = jnp.concatenate([seg, jnp.broadcast_to(seg[-1:], (pad_n,))])
    out = _segment_colsums_pallas(
        tuple(s.astype(jnp.float32) for s in streams),
        seg.astype(jnp.int32), num_segments, len(streams),
        tile=tile, subtile=subtile, bf16x2=bf16x2, interpret=interpret)
    rank = jax.lax.iota(jnp.int32, num_segments)
    valid = jnp.logical_and(rank >= seg[0], rank <= seg[-1])
    return jnp.where(valid[:, None], out, 0.0)


def segment_rowsum(g: jnp.ndarray, seg: jnp.ndarray, num_segments: int,
                   tile: int = 1024, force: str = "auto") -> jnp.ndarray:
    # tile=1024 keeps the seg SMEM block on XLA's s32 1-D {0:T(1024)}
    # layout (Mosaic rejects misaligned SMEM blocks); smaller tiles are
    # fine in tests/interpret mode.
    """Segment sum of g rows over sorted seg. force: auto|pallas|xla|interpret.

    The Pallas path requires W % 128 == 0 (pad lanes at the caller when
    it matters; this wrapper pads and slices automatically) and writes
    rank windows beyond the data as zeros, which matches segment_sum's
    zero-fill for empty segments. Ranks never touched by any window
    (possible when seg[0] > 0) are zeroed by construction because the
    output buffer is freshly allocated by XLA... which does NOT
    guarantee zeros — so the wrapper explicitly masks: ranks outside
    [seg[0], seg[-1]] are zero-filled with a final where().
    """
    from sparkfm_tpu.ops.pallas_rowio import use_pallas_rowio
    if force == "xla" or (force == "auto" and not use_pallas_rowio()):
        return jax.ops.segment_sum(g, seg, num_segments=num_segments)

    n, w = g.shape
    if w > 128 and force != "interpret":
        # Multi-lane-tile rows: the kernel's per-run output windows start
        # at arbitrary (unaligned) rank offsets, which Mosaic only
        # supports for single-tile (<=128 lane) rows — with a (8,128)
        # tiled [3,1] memref it fails "tile index in dimension 0 is
        # divisible by the tiling (8)" (seen with the FFM 354-lane
        # packed payload on v5e). Route wide payloads to XLA's exact
        # segment_sum instead of crashing the compile.
        if force == "pallas":
            raise ValueError(
                f"segment_rowsum Pallas path supports row width <= 128 "
                f"lanes (got {w}); use force='xla' or let 'auto' route")
        return jax.ops.segment_sum(g, seg, num_segments=num_segments)

    interpret = force == "interpret"
    pad_w = (-w) % 128
    if pad_w:
        g = jnp.concatenate(
            [g, jnp.zeros((n, pad_w), g.dtype)], axis=1)
    pad_n = (-n) % tile
    if pad_n:
        g = jnp.concatenate(
            [g, jnp.zeros((pad_n,) + g.shape[1:], g.dtype)], axis=0)
        seg = jnp.concatenate(
            [seg, jnp.broadcast_to(seg[-1:], (pad_n,))])
    out = _segment_rowsum_pallas(g.astype(jnp.float32), seg.astype(jnp.int32),
                                 num_segments, tile=tile,
                                 interpret=interpret)
    # zero ranks no window ever wrote (below seg[0]); ranks above seg[-1]
    # are inside the last window and were written as zeros already, but
    # mask both for safety (uninitialized output memory).
    rank = jax.lax.iota(jnp.int32, num_segments)
    valid = jnp.logical_and(rank >= seg[0], rank <= seg[-1])
    out = jnp.where(valid[:, None], out, 0.0)
    return out[:, :w] if pad_w else out
