"""Pallas TPU kernel: per-row DMA scatter-set into an HBM-resident table.

Why this exists (measured, see ops/embedding.py): XLA's scatter into a
(2^22, K) table costs ~150-200 ns/row on TPU regardless of sorted/unique
flags — it is the single most expensive op in a sparse FM train step. A
row's new value is fully known in advance on the dedup path (unique ids,
blind overwrite), so the scatter is just U independent row writes. This
kernel issues them as pipelined async DMAs from a VMEM tile straight to the
row's HBM address, with NBUF copies in flight; cost approaches the scalar
core's DMA-issue rate (~tens of ns/row) instead of XLA's scatter machinery.

Layout contract:
  * table: (R, K) float32 in HBM; updated IN PLACE via input_output_aliases
    (donate the table at the jit boundary).
  * ids:   (U,) int32, U % tile == 0; every id in [0, R). Duplicate ids are
    allowed but write order is unspecified — the dedup path guarantees
    uniqueness except for the shared dummy row, whose content is garbage by
    contract.
  * rows:  (U, K) float32 — the new row values.

CPU/debug: pass interpret=True (used by the unit tests); the op is also
wrapped with a custom VJP-free fallback `scatter_set_rows_xla` for
non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NBUF = 8  # DMAs in flight


def _writer_kernel(table_ref, ids_ref, rows_ref, out_ref, sem):
    """One grid step: DMA this block's `tile` rows to their table slots.

    rows stay HBM-resident (ANY) and each row is DMA'd HBM->HBM directly:
    no VMEM staging (half the traffic of a pipelined VMEM tile) and no
    lane-tiling constraint on K, so K=1 (w) and K=rank (v) work as well as
    the 128-lane fused-record layout.
    """
    tile = ids_ref.shape[0]
    base = pl.program_id(0) * tile

    def issue(slot, r):
        rid = ids_ref[r]
        return pltpu.make_async_copy(
            rows_ref.at[pl.ds(base + r, 1), :],
            out_ref.at[pl.ds(rid, 1), :],
            sem.at[slot],
        )

    for s in range(min(NBUF, tile)):
        issue(s, s).start()

    def body(r, _):
        slot = jax.lax.rem(r, NBUF)
        issue(slot, r).wait()

        @pl.when(r + NBUF < tile)
        def _():
            issue(slot, r + NBUF).start()

        return 0

    jax.lax.fori_loop(0, tile, body, 0)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def scatter_set_rows(table: jnp.ndarray, ids: jnp.ndarray,
                     rows: jnp.ndarray, tile: int = 512,
                     interpret: bool = False) -> jnp.ndarray:
    """table.at[ids].set(rows) as pipelined row DMAs. See module docstring."""
    u, k = rows.shape
    assert u % tile == 0, (u, tile)
    grid = u // tile
    # ids are streamed per grid step as an SMEM tile (tile*4 bytes) rather
    # than scalar-prefetching the whole array: a prefetched (U,) i32 operand
    # occupies U*4 bytes of SMEM, which overflows the ~1MB SMEM budget for
    # U >= 256K (seen on v5e at dedup budgets).
    del k
    return pl.pallas_call(
        _writer_kernel,
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                # table
            pl.BlockSpec((tile,), lambda i: (i,),
                         memory_space=pltpu.SMEM),            # ids tile
            pl.BlockSpec(memory_space=pl.ANY),                # rows (HBM)
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((NBUF,))],
        out_shape=jax.ShapeDtypeStruct(table.shape, table.dtype),
        input_output_aliases={0: 0},   # table -> out
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(table, ids, rows)


def _gather_kernel(table_ref, ids_ref, out_ref, sem):
    """One grid step: DMA `tile` table rows into this block's output slots.

    Same structure as the writer, direction reversed: table[ids[r]] ->
    out[base + r], HBM->HBM, NBUF DMAs in flight. Per-row cost approaches
    the DMA-issue floor instead of XLA's ~123 ns/row dynamic-slice gather
    (measured, (4M, 128) table on v5e).
    """
    tile = ids_ref.shape[0]
    base = pl.program_id(0) * tile

    def issue(slot, r):
        rid = ids_ref[r]
        return pltpu.make_async_copy(
            table_ref.at[pl.ds(rid, 1), :],
            out_ref.at[pl.ds(base + r, 1), :],
            sem.at[slot],
        )

    for s in range(min(NBUF, tile)):
        issue(s, s).start()

    def body(r, _):
        slot = jax.lax.rem(r, NBUF)
        issue(slot, r).wait()

        @pl.when(r + NBUF < tile)
        def _():
            issue(slot, r + NBUF).start()

        return 0

    jax.lax.fori_loop(0, tile, body, 0)


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def gather_rows_pallas(table: jnp.ndarray, ids: jnp.ndarray,
                       tile: int = 1024,
                       interpret: bool = False) -> jnp.ndarray:
    """table[ids] as pipelined row DMAs. Same layout contract as the
    writer: (R, 128) f32 table, ids (U,) int32 with U % tile == 0."""
    u = ids.shape[0]
    assert u % tile == 0, (u, tile)
    k = table.shape[1]
    return pl.pallas_call(
        _gather_kernel,
        grid=(u // tile,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),                # table
            pl.BlockSpec((tile,), lambda i: (i,),
                         memory_space=pltpu.SMEM),            # ids tile
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),          # out (HBM)
        scratch_shapes=[pltpu.SemaphoreType.DMA((NBUF,))],
        out_shape=jax.ShapeDtypeStruct((u, k), table.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(table, ids)


def gather_rows(table, ids, force: str = "auto",
                indices_are_sorted: bool = False):
    """Row gather dispatch. Honest (dependency-chained) measurements on
    v5e put XLA's gather at ~123 ns/row and this Pallas DMA loop at
    ~148 ns/row for a (4M, 128) table — the scalar DMA-issue loop does
    not beat XLA's native gather, so "auto" is XLA; the Pallas path stays
    for exotic layouts and as a reference (force="pallas")."""
    aligned = table.ndim == 2 and table.shape[1] == 128
    if force in ("auto", "xla") or not aligned:
        return table.at[ids].get(indices_are_sorted=indices_are_sorted,
                                 unique_indices=False, mode="promise_in_bounds")
    interpret = force == "interpret"
    u = ids.shape[0]
    tile = 1024
    pad = (-u) % tile
    if pad:
        ids = jnp.concatenate([ids, jnp.zeros((pad,), ids.dtype)])
    out = gather_rows_pallas(table, ids, tile=tile, interpret=interpret)
    return out[:u] if pad else out


def scatter_set_rows_xla(table, ids, rows, indices_are_sorted=False,
                         unique_indices=False):
    """XLA row write with identical semantics.

    Flag economics measured on v5e (2^16 x 128 rows into a (2^22, 128)
    donated table, chained timing):
      sorted=True,  unique=False:  6.9 ms
      sorted=False, unique=True:   4.7 ms   <- the dedup write-back choice
      sorted=True,  unique=True:   XLA compile hangs (>280 s) — never
                                   combine them on this backend.
    unique_indices is only passed when the caller opts in: dedup plans pad
    unused budget slots with a repeated fill id, so uniqueness is violated
    ONLY on the dummy row — its value races, which is fine exactly because
    the dummy row's content is garbage by contract. Callers writing real
    rows under duplicate ids must keep unique_indices=False.
    """
    return table.at[ids].set(rows, indices_are_sorted=indices_are_sorted,
                             unique_indices=unique_indices,
                             mode="promise_in_bounds")


def use_pallas_rowio() -> bool:
    """Default policy: Pallas row writes on TPU backends only."""
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def scatter_set(table, ids, rows, force: str = "auto",
                indices_are_sorted: bool = False,
                unique_indices: bool = False):
    """Row write dispatch: force in {"auto", "pallas", "xla", "interpret"}.

    "auto" is XLA scatter: honest chained-timing on v5e measured XLA at
    ~107-184 ns/row vs ~670 ns/row for the Pallas per-row DMA writer (the
    scalar core's issue loop is the bottleneck) — the writer stays as a
    forced option and for layouts XLA handles badly elsewhere.

    1-D tables are written as (R, 1); on the Pallas path U is padded to
    the tile size with repeats of the last id/row (idempotent: blind set
    of identical content). Pallas requires the flattened row width to be
    exactly 128 lanes (Mosaic DMA slice tiling).
    """
    squeeze = table.ndim == 1
    if squeeze:
        table = table[:, None]
        rows = rows[:, None]
    flat_rows = rows.reshape(rows.shape[0], -1)
    flat_table = table.reshape(table.shape[0], -1)

    aligned = flat_rows.shape[1] == 128
    if force in ("auto", "xla") or not aligned:
        # NEVER pass sorted+unique together: that combination hangs the
        # XLA:TPU scatter emitter (see scatter_set_rows_xla doc).
        out = scatter_set_rows_xla(
            flat_table, ids, flat_rows,
            indices_are_sorted=indices_are_sorted and not unique_indices,
            unique_indices=unique_indices)
    else:
        interpret = force == "interpret"
        u = ids.shape[0]
        # 1024 keeps the ids SMEM block on XLA's s32 1-D tiling boundary
        # (Mosaic rejects blocks misaligned with the {0:T(1024)} layout).
        tile = 1024
        pad = (-u) % tile
        if pad:
            ids = jnp.concatenate([ids, jnp.broadcast_to(ids[-1:], (pad,))])
            flat_rows = jnp.concatenate(
                [flat_rows, jnp.broadcast_to(flat_rows[-1:],
                                             (pad,) + flat_rows.shape[1:])])
        out = scatter_set_rows(flat_table, ids, flat_rows, tile=tile,
                               interpret=interpret)
    out = out.reshape(table.shape)
    return out[:, 0] if squeeze else out
