"""Pallas TPU tile-blend kernels: forward + backward alpha compositing.

TPU-native replacement for the hot CUDA kernels ``FORWARD::renderCUDA``
(diff-triangle-rasterization-2D/src/forward.cu:198-355) and
``BACKWARD::renderCUDA`` (src/backward.cu:265-493).

Mapping CUDA -> TPU:

- one 16x16 thread block per tile            -> one grid step per 8x128 tile
  (the grid runs sequentially on the TensorCore; parallelism is the 8x128
  VPU register tile across pixels x a SLAB of triangles in sublanes)
- __shared__ batch fetch of 256 triangles    -> async DMA of a [SLAB, 16]
  (src/forward.cu:262-291)                      field slab HBM -> VMEM
- sequential per-pixel transmittance loop    -> vectorized log-depth
                                                Hillis-Steele cumprod over
                                                the slab axis
- early __syncthreads_count(done) exit       -> while_loop stops when
                                                max(T) <= 1e-4
- atomicAdd gradient scatter in backward     -> per-pair gradient rows
  (src/backward.cu:412,482-490)                 written to a pairs buffer,
                                                reduced outside by a
                                                deterministic scatter-add
                                                (the VJP of the pair gather)

Early-termination parity: the sequential CUDA loop freezes T once it
crosses 1e-4. Vectorized, the same semantics fall out of masking with
``alive = (T_exclusive > 1e-4)`` — transmittance is monotone, so ``alive``
is exactly the prefix of entries the reference processes, and
``n_contrib = sum(alive)`` matches the reference's ``last_contributor``.

Field packing (built in ops/rasterize.py, differentiable):
  idx  field
  0..2 a1 = f0 + f1*px + f2*py   (barycentric 1, area-normalized affine)
  3..5 a2 = f3 + f4*px + f5*py
  6    opacity
  7..9 rgb
  10..12 view depth = f10 + f11*a1 + f12*a2
  13..15 view normal
Backward emits gradients w.r.t. the same 16 fields per pair.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NUM_FIELDS = 16
SLAB = 128            # triangles per DMA slab (power of two)
T_EPS = 1e-4
ALPHA_MIN = 1.0 / 255.0
ALPHA_MAX = 0.99
ECC_MAX = 10.0


def _shift_down(x, k, fill):
    """x[i] <- x[i-k] along axis 0, rows < k get `fill`."""
    top = jnp.full((k,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([top, x[:-k]], axis=0)


def _shift_up(x, k, fill):
    """x[i] <- x[i+k] along axis 0, rows >= S-k get `fill`."""
    bot = jnp.full((k,) + x.shape[1:], fill, x.dtype)
    return jnp.concatenate([x[k:], bot], axis=0)


def _cumprod_incl(x):
    """Inclusive prefix product along axis 0 (Hillis-Steele, log steps)."""
    k = 1
    while k < x.shape[0]:
        x = x * _shift_down(x, k, 1.0)
        k *= 2
    return x


def _rev_cumprod_incl(x):
    k = 1
    while k < x.shape[0]:
        x = x * _shift_up(x, k, 1.0)
        k *= 2
    return x


def _rev_cumsum_excl(x):
    """y[i] = sum_{j > i} x[j] along axis 0."""
    x = _shift_up(x, 1, 0.0)
    k = 1
    while k < x.shape[0]:
        x = x + _shift_up(x, k, 0.0)
        k *= 2
    return x


def _fld(buf, k):
    """Field column k of the (SLAB, 16) buffer as (SLAB, 1, 1)."""
    return buf[:, k:k + 1].reshape(SLAB, 1, 1)


def _alpha_terms(buf, px, py, gamma, in_range):
    """Shared recompute: barycentrics -> masked alpha. Shapes (S, TH, TW)."""
    a1 = _fld(buf, 0) + _fld(buf, 1) * px + _fld(buf, 2) * py
    a2 = _fld(buf, 3) + _fld(buf, 4) * px + _fld(buf, 5) * py
    a3 = 1.0 - a1 - a2
    mn = jnp.minimum(jnp.minimum(a1, a2), a3)
    ecc = 1.0 - 3.0 * mn
    ok = (ecc >= 0.0) & (ecc <= ECC_MAX) & in_range
    eccs = jnp.clip(ecc, 0.0, ECC_MAX)
    # ecc ** (2*gamma); photo configs train at gamma == 1 for the whole run,
    # so branch to a transcendental-free square (exp/log via lax.cond only
    # during the solidify anneal).
    powed = jax.lax.cond(
        gamma == 1.0,
        lambda e: e * e,
        lambda e: jnp.exp((2.0 * gamma) * jnp.log(e)),
        eccs)
    expp = jnp.exp(-0.5 * powed)
    alpha_un = _fld(buf, 6) * expp
    alpha = jnp.minimum(ALPHA_MAX, alpha_un)
    ok = ok & (alpha >= ALPHA_MIN)
    alpha = jnp.where(ok, alpha, 0.0)
    return a1, a2, a3, eccs, expp, alpha_un, alpha, ok


def _pixel_coords(tile_x, tile_y, th, tw):
    """Pixel coordinates of this tile as (1, TH, TW) f32."""
    row = jax.lax.broadcasted_iota(jnp.int32, (1, th, tw), 1)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, th, tw), 2)
    px = (tile_x * tw + col).astype(jnp.float32)
    py = (tile_y * th + row).astype(jnp.float32)
    return px, py


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _fwd_kernel(
    # scalar prefetch
    tile_starts,          # (num_tiles + 1,) int32, SMEM — SLAB-aligned
    tile_counts,          # (num_tiles,) int32, SMEM — real pairs per tile
    params,               # (8,) f32, SMEM: [gamma, bg_r, bg_g, bg_b, bg_depth]
    # inputs
    pairs_hbm,            # (16, MP) f32, HBM, field-major
    # outputs
    color_ref,            # (3, TH, TW) VMEM block
    depth_ref,            # (TH, TW)
    normal_ref,           # (3, TH, TW)
    finalT_ref,           # (TH, TW)
    ncontrib_ref,         # (TH, TW) int32
    pair_contrib_hbm,     # (2, MP) f32, HBM — written via DMA
    # scratch
    buf,                  # VMEM (2, 16, SLAB) — double-buffered input slabs
    stage,                # VMEM (2, 2, SLAB) — pair contrib staging slots
    accum,                # VMEM (8, TH, TW): rgb, depth, normal, T
    ncnt,                 # VMEM (TH, TW) int32
    in_sem,               # DMA (2,)
    out_sem,              # DMA (2,)
    *, tile_h: int, tile_w: int, grid_w: int, width: int, height: int,
    rich: bool,
):
    th, tw = tile_h, tile_w
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    tile_id = ty * grid_w + tx
    start = pl.multiple_of(tile_starts[tile_id], SLAB)
    npairs = tile_counts[tile_id]
    nslabs = pl.cdiv(npairs, SLAB)

    gamma = params[0]
    bg_depth = params[4]

    px, py = _pixel_coords(tx, ty, th, tw)
    inside = (px < width) & (py < height)

    accum[:, :, :] = jnp.zeros((8, th, tw), jnp.float32)
    accum[7:8, :, :] = jnp.where(inside, 1.0, 0.0)
    ncnt[:, :] = jnp.zeros((th, tw), jnp.int32)

    e_iota = jax.lax.broadcasted_iota(jnp.int32, (SLAB, 1, 1), 0)

    def in_dma(slot, s):
        off = pl.multiple_of(start + s * SLAB, SLAB)
        return pltpu.make_async_copy(
            pairs_hbm.at[:, pl.ds(off, SLAB)], buf.at[slot], in_sem.at[slot])

    @pl.when(nslabs > 0)
    def _():
        in_dma(0, 0).start()

    def body(carry):
        s, _ = carry
        slot = s % 2
        # Prefetch the next slab while this one computes.
        @pl.when(s + 1 < nslabs)
        def _():
            in_dma((s + 1) % 2, s + 1).start()
        in_dma(slot, s).wait()
        buf_t = buf[slot, :, :].T                               # (SLAB, 16)

        in_range = (e_iota + s * SLAB) < npairs                 # (S, 1, 1)
        a1, a2, a3, eccs, expp, alpha_un, alpha, ok = _alpha_terms(
            buf_t, px, py, gamma, in_range)

        one_m = 1.0 - alpha
        cp_incl = _cumprod_incl(one_m)
        cp_excl = _shift_down(cp_incl, 1, 1.0)
        T_carry = accum[7:8, :, :]
        T_excl = T_carry * cp_excl
        alive = T_excl > T_EPS
        contrib = jnp.where(alive, alpha * T_excl, 0.0)         # (S, TH, TW)

        accum[0:1, :, :] += jnp.sum(contrib * _fld(buf_t, 7), axis=0, keepdims=True)
        accum[1:2, :, :] += jnp.sum(contrib * _fld(buf_t, 8), axis=0, keepdims=True)
        accum[2:3, :, :] += jnp.sum(contrib * _fld(buf_t, 9), axis=0, keepdims=True)
        if rich:
            d = _fld(buf_t, 10) + _fld(buf_t, 11) * a1 + _fld(buf_t, 12) * a2
            accum[3:4, :, :] += jnp.sum(contrib * d, axis=0, keepdims=True)
            accum[4:5, :, :] += jnp.sum(contrib * _fld(buf_t, 13), axis=0, keepdims=True)
            accum[5:6, :, :] += jnp.sum(contrib * _fld(buf_t, 14), axis=0, keepdims=True)
            accum[6:7, :, :] += jnp.sum(contrib * _fld(buf_t, 15), axis=0, keepdims=True)
        ncnt[:, :] += jnp.sum((alive & in_range).astype(jnp.int32), axis=0)

        T_incl = T_excl * one_m
        slab_min = jnp.min(jnp.where(alive, T_incl, 2.0), axis=0, keepdims=True)
        new_T = jnp.minimum(T_carry, slab_min)
        accum[7:8, :, :] = new_T

        # Two-step reductions: Mosaic rejects multi-axis reduces on 3D vregs.
        @pl.when(s >= 2)
        def _():
            out_dma_wait(slot)
        c_sum = jnp.sum(jnp.sum(contrib, axis=1), axis=1, keepdims=True)
        c_max = jnp.max(jnp.max(contrib, axis=1), axis=1, keepdims=True)
        stage[slot, :, :] = jnp.concatenate([c_sum, c_max], axis=1).T  # (2, SLAB)
        out_dma(slot, s).start()

        return s + 1, jnp.max(new_T)

    def out_dma(slot, s):
        off = pl.multiple_of(start + s * SLAB, SLAB)
        return pltpu.make_async_copy(
            stage.at[slot], pair_contrib_hbm.at[:, pl.ds(off, SLAB)],
            out_sem.at[slot])

    def out_dma_wait(slot):
        # Waiting only needs the semaphore; reconstruct with matching shape.
        pltpu.make_async_copy(stage.at[slot],
                              pair_contrib_hbm.at[:, pl.ds(0, SLAB)],
                              out_sem.at[slot]).wait()

    def cond(carry):
        s, t_max = carry
        return (s < nslabs) & (t_max > T_EPS)

    s_final, _ = jax.lax.while_loop(cond, body, (0, jnp.float32(1.0)))

    # Early exit can leave the prefetched next input slab in flight; an
    # un-awaited DMA at kernel end traps the device on the next grid step.
    @pl.when(s_final < nslabs)
    def _():
        in_dma(s_final % 2, s_final).wait()

    # Drain pending contrib writes (up to two in flight).
    @pl.when(s_final >= 2)
    def _():
        out_dma_wait(s_final % 2)

    @pl.when(s_final >= 1)
    def _():
        out_dma_wait((s_final + 1) % 2)

    # Slabs skipped by early exit still need their pair-contrib slots
    # zeroed (the buffer is uninitialized output memory).
    def zero_body(s):
        stage[0, :, :] = jnp.zeros((2, SLAB), jnp.float32)
        out_dma(0, s).start()
        out_dma_wait(0)
        return s + 1

    jax.lax.while_loop(lambda s: s < nslabs, zero_body, s_final)

    T_fin = accum[7:8, :, :]
    color_ref[0:1, :, :] = accum[0:1, :, :] + T_fin * params[1]
    color_ref[1:2, :, :] = accum[1:2, :, :] + T_fin * params[2]
    color_ref[2:3, :, :] = accum[2:3, :, :] + T_fin * params[3]
    if rich:
        depth_ref[:, :] = accum[3, :, :] + T_fin[0] * bg_depth
        normal_ref[:, :, :] = accum[4:7, :, :]
    else:
        depth_ref[:, :] = T_fin[0] * bg_depth
        normal_ref[:, :, :] = jnp.zeros((3, th, tw), jnp.float32)
    finalT_ref[:, :] = T_fin[0]
    ncontrib_ref[:, :] = ncnt[:, :]


def blend_forward(pairs: jax.Array, tile_starts: jax.Array,
                  tile_counts: jax.Array, params: jax.Array,
                  *, image_width: int, image_height: int, tile_h: int,
                  tile_w: int, rich: bool = True, interpret: bool = False):
    """Run the forward blend kernel.

    Args:
        pairs: (16, MP) f32 packed pair fields, field-major, MP % SLAB == 0,
            per-tile ranges SLAB-aligned (see Binning).
        tile_starts: (num_tiles + 1,) int32 aligned starts.
        tile_counts: (num_tiles,) int32 real pair counts.
        params: (8,) f32 [gamma, bg_r, bg_g, bg_b, bg_depth, 0, 0, 0].
    Returns:
        color (3,H,W), depth (H,W), normal (3,H,W), final_T (H,W),
        n_contrib (H,W) i32, pair_contrib (2, MP).
    """
    grid_w = pl.cdiv(image_width, tile_w)
    grid_h = pl.cdiv(image_height, tile_h)
    mp_pad = pairs.shape[1]
    Hp, Wp = grid_h * tile_h, grid_w * tile_w

    kernel = functools.partial(_fwd_kernel, tile_h=tile_h, tile_w=tile_w,
                               grid_w=grid_w, width=image_width,
                               height=image_height, rich=rich)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(grid_h, grid_w),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=[
            pl.BlockSpec((3, tile_h, tile_w), lambda i, j, *_: (0, i, j)),
            pl.BlockSpec((tile_h, tile_w), lambda i, j, *_: (i, j)),
            pl.BlockSpec((3, tile_h, tile_w), lambda i, j, *_: (0, i, j)),
            pl.BlockSpec((tile_h, tile_w), lambda i, j, *_: (i, j)),
            pl.BlockSpec((tile_h, tile_w), lambda i, j, *_: (i, j)),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, NUM_FIELDS, SLAB), jnp.float32),
            pltpu.VMEM((2, 2, SLAB), jnp.float32),
            pltpu.VMEM((8, tile_h, tile_w), jnp.float32),
            pltpu.VMEM((tile_h, tile_w), jnp.int32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out_shapes = [
        jax.ShapeDtypeStruct((3, Hp, Wp), jnp.float32),
        jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        jax.ShapeDtypeStruct((3, Hp, Wp), jnp.float32),
        jax.ShapeDtypeStruct((Hp, Wp), jnp.float32),
        jax.ShapeDtypeStruct((Hp, Wp), jnp.int32),
        jax.ShapeDtypeStruct((2, mp_pad), jnp.float32),
    ]
    color, depth, normal, final_T, n_contrib, pair_contrib = pl.pallas_call(
        kernel, grid_spec=grid_spec, out_shape=out_shapes, interpret=interpret,
    )(tile_starts, tile_counts, params, pairs)

    H, W = image_height, image_width
    return (color[:, :H, :W], depth[:H, :W], normal[:, :H, :W],
            final_T[:H, :W], n_contrib[:H, :W], pair_contrib)


# ---------------------------------------------------------------------------
# Backward
# ---------------------------------------------------------------------------

def _bwd_kernel(
    # scalar prefetch
    tile_starts, tile_counts, params,
    # inputs
    pairs_hbm,            # (16, MP) HBM, field-major
    g_color_ref,          # (3, TH, TW) VMEM block
    g_depth_ref,          # (TH, TW)
    g_normal_ref,         # (3, TH, TW)
    finalT_ref,           # (TH, TW)
    ncontrib_ref,         # (TH, TW) int32
    # outputs
    pair_grads_hbm,       # (16, MP) HBM — via DMA
    # scratch
    buf,                  # VMEM (2, 16, SLAB) — double-buffered input
    gstage,               # VMEM (2, 16, SLAB) — output staging slots
    carry_ref, in_sem, out_sem,
    *, tile_h: int, tile_w: int, grid_w: int, width: int, height: int,
    rich: bool,
):
    th, tw = tile_h, tile_w
    ty = pl.program_id(0)
    tx = pl.program_id(1)
    tile_id = ty * grid_w + tx
    start = pl.multiple_of(tile_starts[tile_id], SLAB)
    npairs = tile_counts[tile_id]
    nslabs = pl.cdiv(npairs, SLAB)

    gamma = params[0]
    bg_depth = params[4]

    px, py = _pixel_coords(tx, ty, th, tw)

    g_col = g_color_ref[:, :, :]                               # (3, TH, TW)
    g_dep = g_depth_ref[:, :].reshape(1, th, tw)
    g_nrm = g_normal_ref[:, :, :]
    final_T = finalT_ref[:, :].reshape(1, th, tw)
    n_contrib = ncontrib_ref[:, :].reshape(1, th, tw)

    # Suffix accumulator A starts with the background term
    # (everything "behind" the last entry): T_final * (bg . g).
    bg_dot = (params[1] * g_col[0:1] + params[2] * g_col[1:2]
              + params[3] * g_col[2:3])
    if rich:
        bg_dot = bg_dot + bg_depth * g_dep
    carry_ref[0:1, :, :] = final_T * bg_dot    # A
    carry_ref[1:2, :, :] = final_T             # T_back

    e_iota = jax.lax.broadcasted_iota(jnp.int32, (SLAB, 1, 1), 0)

    def in_dma(slot, s):
        off = pl.multiple_of(start + s * SLAB, SLAB)
        return pltpu.make_async_copy(
            pairs_hbm.at[:, pl.ds(off, SLAB)], buf.at[slot], in_sem.at[slot])

    def out_dma(slot, s):
        off = pl.multiple_of(start + s * SLAB, SLAB)
        return pltpu.make_async_copy(
            gstage.at[slot], pair_grads_hbm.at[:, pl.ds(off, SLAB)],
            out_sem.at[slot])

    def out_dma_wait(slot):
        pltpu.make_async_copy(gstage.at[slot],
                              pair_grads_hbm.at[:, pl.ds(0, SLAB)],
                              out_sem.at[slot]).wait()

    @pl.when(nslabs > 0)
    def _():
        in_dma((nslabs - 1) % 2, nslabs - 1).start()

    def body(i, _):
        s = nslabs - 1 - i                                     # reverse order
        slot = s % 2
        @pl.when(s - 1 >= 0)
        def _():
            in_dma((s - 1) % 2, s - 1).start()
        in_dma(slot, s).wait()
        buf_t = buf[slot, :, :].T                              # (SLAB, 16)

        e = e_iota + s * SLAB                                  # (S, 1, 1)
        in_range = e < npairs
        a1, a2, a3, eccs, expp, alpha_un, alpha, ok = _alpha_terms(
            buf_t, px, py, gamma, in_range)
        processed = e < n_contrib                              # (S, TH, TW)
        alpha = jnp.where(processed, alpha, 0.0)
        ok = ok & processed

        inv1m = 1.0 / (1.0 - alpha)
        R = _rev_cumprod_incl(inv1m)                           # (S, TH, TW)
        T_back = carry_ref[1:2, :, :]
        T_excl = T_back * R
        contrib = alpha * T_excl

        gdot = (_fld(buf_t, 7) * g_col[0:1] + _fld(buf_t, 8) * g_col[1:2]
                + _fld(buf_t, 9) * g_col[2:3])
        if rich:
            d = _fld(buf_t, 10) + _fld(buf_t, 11) * a1 + _fld(buf_t, 12) * a2
            gdot = (gdot + d * g_dep
                    + _fld(buf_t, 13) * g_nrm[0:1] + _fld(buf_t, 14) * g_nrm[1:2]
                    + _fld(buf_t, 15) * g_nrm[2:3])

        w = contrib * gdot
        A = carry_ref[0:1, :, :] + _rev_cumsum_excl(w)         # (S, TH, TW)
        dL_da = jnp.where(ok, T_excl * gdot - A * inv1m, 0.0)

        not_clamped = alpha_un < ALPHA_MAX
        d_opac = jnp.where(ok & not_clamped, dL_da * expp, 0.0)
        # d(alpha)/d(ecc) = alpha_unclamped * (-gamma) * ecc^(2*gamma - 1)
        ecc_pow = jax.lax.cond(
            gamma == 1.0,
            lambda e: e,
            lambda e: jnp.exp((2.0 * gamma - 1.0) * jnp.log(e)),
            eccs)
        dL_decc = jnp.where(ok & not_clamped,
                            dL_da * alpha_un * (-gamma) * ecc_pow, 0.0)

        # ecc subgradient on the argmin barycentric (src/backward.cu:345-404);
        # a3 = 1 - a1 - a2 chains into both a1 and a2.
        is1 = (a1 <= a2) & (a1 <= a3)
        is2 = jnp.logical_and(jnp.logical_not(is1), a2 <= a3)
        is3 = jnp.logical_not(jnp.logical_or(is1, is2))
        d_ecc3 = 3.0 * dL_decc
        dL_da1 = jnp.where(is1, -d_ecc3, 0.0) + jnp.where(is3, d_ecc3, 0.0)
        dL_da2 = jnp.where(is2, -d_ecc3, 0.0) + jnp.where(is3, d_ecc3, 0.0)
        if rich:
            dL_da1 = dL_da1 + contrib * g_dep * _fld(buf_t, 11)
            dL_da2 = dL_da2 + contrib * g_dep * _fld(buf_t, 12)

        # Reduce over pixels -> per-pair field gradients.
        def rsum(x):
            # Two-step: multi-axis reduces on 3D vregs are unsupported.
            return jnp.sum(jnp.sum(x, axis=1), axis=1, keepdims=True)  # (S,1)

        zero = jnp.zeros((SLAB, 1), jnp.float32)
        if rich:
            rich_cols = [
                rsum(contrib * g_dep), rsum(contrib * g_dep * a1),
                rsum(contrib * g_dep * a2),
                rsum(contrib * g_nrm[0:1]), rsum(contrib * g_nrm[1:2]),
                rsum(contrib * g_nrm[2:3]),
            ]
        else:
            rich_cols = [zero] * 6
        gmat = jnp.concatenate([
            rsum(dL_da1), rsum(dL_da1 * px), rsum(dL_da1 * py),
            rsum(dL_da2), rsum(dL_da2 * px), rsum(dL_da2 * py),
            rsum(d_opac),
            rsum(contrib * g_col[0:1]), rsum(contrib * g_col[1:2]),
            rsum(contrib * g_col[2:3]),
        ] + rich_cols, axis=1)                                 # (SLAB, 16)

        @pl.when(i >= 2)
        def _():
            out_dma_wait(slot)
        gstage[slot, :, :] = gmat.T                            # (16, SLAB)
        out_dma(slot, s).start()

        carry_ref[0:1, :, :] += jnp.sum(w, axis=0, keepdims=True)
        # R[0] = prod of all inv(1-alpha) in the slab => T at slab start.
        carry_ref[1:2, :, :] = T_back * R[0:1, :, :]
        return ()

    jax.lax.fori_loop(0, nslabs, body, ())

    # Drain in-flight gradient writes (up to two slots).
    @pl.when(nslabs >= 2)
    def _():
        out_dma_wait(nslabs % 2)

    @pl.when(nslabs >= 1)
    def _():
        out_dma_wait((nslabs + 1) % 2)


def blend_backward(pairs: jax.Array, tile_starts: jax.Array,
                   tile_counts: jax.Array, params: jax.Array,
                   final_T: jax.Array, n_contrib: jax.Array,
                   g_color: jax.Array, g_depth: jax.Array, g_normal: jax.Array,
                   *, image_width: int, image_height: int, tile_h: int,
                   tile_w: int, rich: bool = True,
                   interpret: bool = False) -> jax.Array:
    """Backward blend: per-pair gradients (16, MP) for the packed fields."""
    grid_w = pl.cdiv(image_width, tile_w)
    grid_h = pl.cdiv(image_height, tile_h)
    mp_pad = pairs.shape[1]
    Hp, Wp = grid_h * tile_h, grid_w * tile_w

    def pad_hw(x):
        pads = [(0, Hp - x.shape[-2]), (0, Wp - x.shape[-1])]
        if x.ndim == 3:
            pads = [(0, 0)] + pads
        return jnp.pad(x, pads)

    kernel = functools.partial(_bwd_kernel, tile_h=tile_h, tile_w=tile_w,
                               grid_w=grid_w, width=image_width,
                               height=image_height, rich=rich)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(grid_h, grid_w),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((3, tile_h, tile_w), lambda i, j, *_: (0, i, j)),
            pl.BlockSpec((tile_h, tile_w), lambda i, j, *_: (i, j)),
            pl.BlockSpec((3, tile_h, tile_w), lambda i, j, *_: (0, i, j)),
            pl.BlockSpec((tile_h, tile_w), lambda i, j, *_: (i, j)),
            pl.BlockSpec((tile_h, tile_w), lambda i, j, *_: (i, j)),
        ],
        out_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        scratch_shapes=[
            pltpu.VMEM((2, NUM_FIELDS, SLAB), jnp.float32),
            pltpu.VMEM((2, NUM_FIELDS, SLAB), jnp.float32),
            pltpu.VMEM((2, tile_h, tile_w), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    (pair_grads,) = pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((NUM_FIELDS, mp_pad), jnp.float32)],
        interpret=interpret,
    )(tile_starts, tile_counts, params, pairs, pad_hw(g_color), pad_hw(g_depth),
      pad_hw(g_normal), pad_hw(final_T), pad_hw(n_contrib))
    return pair_grads
