"""Fused SGM path-aggregation kernels (Pallas/TPU).

Replaces the directional cost aggregation of the reference CUDA backend
(SfM/src/dense/cudasgm/src/path_aggregation.cu and its horizontal/vertical/
oblique variants) with two kernels in the volume's natural (H, W, D) layout:

* ``horizontal_pair``: left->right and right->left paths, one kernel.
  Grid over column blocks (row-band split for VMEM); carries (Hb, D) live in
  VMEM scratch across the sequential grid (TPU grids execute in order).
* ``vertical_diag``: the remaining 6 paths — down/up and the 4 obliques —
  as one kernel scanning rows.  KEY TRICK: a diagonal path is a vertical
  scan whose carry is shifted by +-1 column per row (pred of (y, x) on the
  "down-right" path is (y-1, x-1) — shift the carried row by one along x and
  the recurrence is elementwise again).  No shears, no transposes, no big
  rearranged copies.

Everything is int16 fixed point: census Hamming costs are integers <= 64,
per-path aggregated values are bounded by C_max + P2 <= 184, and the 8-path
sum by 1472 — int16 halves HBM traffic and doubles VPU lanes vs f32.

Boundary/restart semantics: a path entering the image (or a shifted-in
column) sees a carry row that is CONSTANT across d; then best = m and
out = c exactly — i.e. a uniform carry is precisely SGM's "path restarts
here".  Carries are initialised to a uniform big value and shifted-in
columns filled with it, so no extra masking is needed anywhere.

The fwd and bwd direction of each kernel read the same cost volume through
two BlockSpecs whose index maps walk the grid in opposite orders, so each
kernel is one HBM pass over the volume per direction with K scan sub-steps
per grid step (amortising the per-step dispatch cost that made the XLA
`lax.scan` version ~6x slower than HBM speed-of-light).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 8000           # uniform "restart" value.  Must dominate any real
                      # path value (<= c_max + P2 = 184) and keep the
                      # 8-path pad-lane sum under 2^16 - 1 for the packed
                      # volume format: 8 * (_BIG + P2) = 64,960 < 65,535


def _pack2(lo, hi):
    """Pack two non-negative <= 0xffff int32 slabs into one int32 slab.

    Pallas block transfer on this platform is ELEMENT-rate-limited
    (~19-22 G elements/s for every dtype; see _kv_for), so carrying two
    16-bit cost values per int32 element HALVES every volume pass.  The
    int32 << wraps when hi >= 0x8000 — two's complement keeps the bit
    pattern, _unpack2 masks it back."""
    return (hi << 16) | lo


def _unpack2(v):
    return v & 0xFFFF, (v >> 16) & 0xFFFF


def _pack2f(lo, hi):
    """_pack2 for float compute values (exact integers <= 0xffff).

    Packed volumes store int32 but the kernels COMPUTE in f32: int32
    vector min/add measured ~2.5x slower than f32 on this VPU (12.6 vs
    5.4 ms for the same _partial_sum), which would swamp the DMA win."""
    return _pack2(lo.astype(jnp.int32), hi.astype(jnp.int32))


def _unpack2f(v, dt):
    lo, hi = _unpack2(v)
    return lo.astype(dt), hi.astype(dt)


def _pack_rows(vol):
    """(2N, W, D) int32 volume -> (N, W, D) row-pair-packed int32."""
    return _pack2(vol[0::2], vol[1::2])


def _unpack_rows(pv, h: int):
    """Inverse of _pack_rows, cropped to h rows."""
    lo, hi = _unpack2(pv)
    n, w, d = pv.shape
    return jnp.stack([lo, hi], axis=1).reshape(2 * n, w, d)[:h]


def _step(prev, c, p1, p2):
    """One SGM recurrence on a (S, D) slab, disparity on the lane axis.

    L = c + min(prev, prev[d-1]+P1, prev[d+1]+P1, m+P2) - m,  m = min_d prev.
    """
    # int32 arithmetic: Mosaic on this libtpu does not legalize 16-bit
    # vector min/rotate — HBM blocks stay int16 (the traffic win), the
    # in-VMEM math is int32 (casts at load/store)
    m = jnp.min(prev, axis=-1, keepdims=True)
    fill = jnp.full_like(prev[..., :1], _BIG)
    sp = jnp.concatenate([fill, prev[..., :-1]], axis=-1)
    sn = jnp.concatenate([prev[..., 1:], fill], axis=-1)
    best = jnp.minimum(jnp.minimum(prev, m + p2),
                       jnp.minimum(sp + p1, sn + p1))
    return c + best - m


def _shift_cols(prev, direction: int):
    """Shift a (W, D) carry by one along W (sublane); fill with _BIG.

    direction=+1: out[x] = prev[x-1] (down-right paths);
    direction=-1: out[x] = prev[x+1] (down-left paths).
    """
    fill = jnp.full_like(prev[:1], _BIG)
    if direction > 0:
        return jnp.concatenate([fill, prev[:-1]], axis=0)
    return jnp.concatenate([prev[1:], fill], axis=0)


def _horizontal_kernel(in_f, in_b, out_f, out_b, carr_f, carr_b,
                       *, k: int, p1: int, p2: int, packed: bool):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        carr_f[:] = jnp.full_like(carr_f, _BIG)
        carr_b[:] = jnp.full_like(carr_b, _BIG)

    sdt = out_f.dtype
    cdt = carr_f.dtype
    hb = in_f.shape[0]        # packed rows per block (= carry rows // 2)

    def load(ref, kk):
        """One (rows, D) cost slab; packed rows unpack to [lo… , hi…]."""
        slab = ref[:, kk, :]
        if packed:
            lo, hi = _unpack2f(slab, cdt)
            return jnp.concatenate([lo, hi], axis=0)
        return slab.astype(cdt)

    def store(ref, kk, val):
        if packed:
            ref[:, kk, :] = _pack2f(val[:hb], val[hb:])
        else:
            ref[:, kk, :] = val.astype(sdt)

    # horizontal paths are row-independent, so the lo/hi halves of a packed
    # pair step TOGETHER as extra sublanes of one (2*hb, D) slab
    for kk in range(k):
        nf = _step(carr_f[:], load(in_f, kk), p1, p2)
        store(out_f, kk, nf)
        carr_f[:] = nf
        nb = _step(carr_b[:], load(in_b, k - 1 - kk), p1, p2)
        store(out_b, k - 1 - kk, nb)
        carr_b[:] = nb


def _vertical_fwd_kernel(in_c, in_hf, in_hb, out, cv, cd1, cd2,
                         *, k: int, p1: int, p2: int, diag: bool,
                         packed: bool):
    """Down + down-right + down-left paths, PLUS the two horizontal
    volumes folded in: out = hf + hb + v + d1 + d2.  Folding the sum here
    removes a whole read+write pass over the volume that a separate
    4-operand XLA add would cost.

    packed=True: each block row holds TWO image rows (int32 lo/hi 16-bit
    halves).  Vertical paths scan rows sequentially, so the pair is two
    chained _step calls per loaded element — same per-pixel compute,
    half the DMA."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for ref in (cv, cd1, cd2):
            ref[:] = jnp.full_like(ref, _BIG)

    sdt = out.dtype
    cdt = cv.dtype

    # fori_loop (not a python unroll): k can be large — blocks slice the
    # LEADING (untiled) axis, so dynamic row indexing is cheap, and the
    # kernel body stays O(1) in code size (python-unrolled variants blew
    # up Mosaic compile time)
    def body(kk, _):
        if packed:
            c_lo, c_hi = _unpack2f(in_c[kk], cdt)
            hf_lo, hf_hi = _unpack2f(in_hf[kk], cdt)
            hb_lo, hb_hi = _unpack2f(in_hb[kk], cdt)
            nv_lo = _step(cv[:], c_lo, p1, p2)
            nv_hi = _step(nv_lo, c_hi, p1, p2)
            cv[:] = nv_hi
            tot_lo = nv_lo + hf_lo + hb_lo
            tot_hi = nv_hi + hf_hi + hb_hi
            if diag:
                nd1_lo = _step(_shift_cols(cd1[:], +1), c_lo, p1, p2)  # DR
                nd1_hi = _step(_shift_cols(nd1_lo, +1), c_hi, p1, p2)
                cd1[:] = nd1_hi
                nd2_lo = _step(_shift_cols(cd2[:], -1), c_lo, p1, p2)  # DL
                nd2_hi = _step(_shift_cols(nd2_lo, -1), c_hi, p1, p2)
                cd2[:] = nd2_hi
                tot_lo = tot_lo + nd1_lo + nd2_lo
                tot_hi = tot_hi + nd1_hi + nd2_hi
            out[kk] = _pack2f(tot_lo, tot_hi)
            return 0
        cf = in_c[kk].astype(cdt)
        nv = _step(cv[:], cf, p1, p2)
        cv[:] = nv
        tot = nv + in_hf[kk].astype(cdt) + in_hb[kk].astype(cdt)
        if diag:
            nd1 = _step(_shift_cols(cd1[:], +1), cf, p1, p2)   # down-right
            nd2 = _step(_shift_cols(cd2[:], -1), cf, p1, p2)   # down-left
            cd1[:] = nd1
            cd2[:] = nd2
            tot = tot + nd1 + nd2
        out[kk] = tot.astype(sdt)
        return 0

    jax.lax.fori_loop(0, k, body, 0)


def _wta_rows(tot, d_real: int, compute, subpix: bool = True):
    """Fused winner-takes-all reductions over the lane (disparity) axis of
    one (W, D) slab: ONE VMEM-resident pass produces everything the
    per-pixel tail needs (ref winner_takes_all.cu) —
      c0   : best cost
      best : argmin disparity
      c1   : second best with |d - best| > 1 excluded (uniqueness test)
      cm/cp: costs at clip(best)±1 (parabolic subpixel; subpix=False
             returns zeros — the right-image pass only feeds the <=1 px
             LR consistency check, where integer disparity suffices, as
             in libsgm's right WTA; skipping its 6 masked-reduction
             passes measured ~1 ms/frame at 512x640x128)
    Replaces ~6 full XLA reduction passes over the (H, W, D) volume.
    """
    D = tot.shape[-1]
    iota = jax.lax.broadcasted_iota(jnp.int32, tot.shape, 1)
    c0 = jnp.min(tot, axis=-1)
    # argmin via min-of-iota-where-min (Mosaic-safe; ties -> smallest d,
    # matching jnp.argmin)
    best = jnp.min(jnp.where(tot == c0[:, None], iota, D), axis=-1)
    big = jnp.asarray(_BIG * 2, compute)
    masked = jnp.where(jnp.abs(iota - best[:, None]) <= 1, big, tot)
    c1 = jnp.min(masked, axis=-1)
    if not subpix:
        zero = jnp.zeros_like(c0)
        return c0, best, c1, zero, zero, zero
    bm = jnp.clip(best, 1, d_real - 2)
    sel = iota - bm[:, None]
    zero = jnp.zeros((), compute)
    cm = jnp.sum(jnp.where(sel == -1, tot, zero), axis=-1)
    cc = jnp.sum(jnp.where(sel == 0, tot, zero), axis=-1)
    cp = jnp.sum(jnp.where(sel == 1, tot, zero), axis=-1)
    return c0, best, c1, cm, cc, cp


_BIG_R = 30000        # out-of-range fill for the right-image skewed volume


def _skew_diag(tot, w_real: int, compute):
    """In-VMEM diagonal skew: out[x, d] = tot[x+d, d], with x+d >= w_real
    filled by _BIG_R — the right-image cost volume cost_r(x, d) =
    total(x+d, d) built by a log2(D) barrel shifter (7 sublane shifts with
    per-lane bit selection) instead of a full XLA pad/reshape pass over
    HBM."""
    W, D = tot.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, tot.shape, 1)
    big = jnp.asarray(_BIG_R, compute)
    out = tot
    step = 1
    while step < D:
        if step >= W:      # shift farther than the slab: everything spills
            shifted = jnp.full((W, D), big, compute)
        else:
            fill = jnp.full((step, D), big, compute)
            shifted = jnp.concatenate([out[step:], fill], axis=0)
        out = jnp.where((lane & step) != 0, shifted, out)
        step *= 2
    sub = jax.lax.broadcasted_iota(jnp.int32, tot.shape, 0)
    return jnp.where(sub + lane >= w_real, big, out)


_WTA_CH = 16         # channel-packed WTA maps: 2x6 used + 4 pad (see below)


def _vertical_bwd_kernel(in_c, in_p, out, cv, cd1, cd2,
                         *, k: int, p1: int, p2: int, diag: bool,
                         d_real: int, w_real: int, packed: bool):
    """Up + up-left + up-right paths added onto the forward partial sum —
    the running block then holds the COMPLETE 8-path total, so BOTH fused
    WTA epilogues (left image, and right image via the in-VMEM diagonal
    skew) run here while the slab is still in VMEM.  The summed volume
    itself is never written back to HBM.

    The 12 per-pixel WTA maps are packed as CHANNELS of one
    (KV, 16, Wp) output and stored with a dynamic index on the untiled
    leading axis only: current Mosaic rejects dynamic single-row stores
    into 2D blocks ('cannot statically prove that index in dimension 0 is
    a multiple of 8' — the sublane axis needs static alignment), while
    leading-axis stores into 3D blocks are unconstrained.  Channel order:
    (c0, best, c1, cm, cc, cp) left, then the same for right; 4 pad rows
    keep the sublane dim at 16 (the int16 tile)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for ref in (cv, cd1, cd2):
            ref[:] = jnp.full_like(ref, _BIG)

    sdt = out.dtype
    cdt = cv.dtype

    def wta12(tot):
        """The 12 channel maps (left WTA + skewed-right WTA) of one row;
        right is integer-only (feeds the LR check, libsgm semantics)."""
        l6 = _wta_rows(tot, d_real, cdt)
        r6 = _wta_rows(_skew_diag(tot, w_real, cdt), d_real, cdt,
                       subpix=False)
        zero = jnp.zeros_like(l6[0])
        return jnp.stack([v.astype(cdt) for v in l6 + r6]
                         + [zero] * (_WTA_CH - 12))

    def body(kk, _):
        r = k - 1 - kk
        if packed:
            # upward scan: the hi half (row 2r+1) precedes the lo half
            c_lo, c_hi = _unpack2f(in_c[r], cdt)
            p_lo, p_hi = _unpack2f(in_p[r], cdt)
            nv_hi = _step(cv[:], c_hi, p1, p2)
            nv_lo = _step(nv_hi, c_lo, p1, p2)
            cv[:] = nv_lo
            tot_hi = nv_hi + p_hi
            tot_lo = nv_lo + p_lo
            if diag:
                nd1_hi = _step(_shift_cols(cd1[:], -1), c_hi, p1, p2)  # UL
                nd1_lo = _step(_shift_cols(nd1_hi, -1), c_lo, p1, p2)
                cd1[:] = nd1_lo
                nd2_hi = _step(_shift_cols(cd2[:], +1), c_hi, p1, p2)  # UR
                nd2_lo = _step(_shift_cols(nd2_hi, +1), c_lo, p1, p2)
                cd2[:] = nd2_lo
                tot_hi = tot_hi + nd1_hi + nd2_hi
                tot_lo = tot_lo + nd1_lo + nd2_lo
            out[r] = _pack2f(wta12(tot_lo), wta12(tot_hi))
            return 0
        cb = in_c[r].astype(cdt)
        nv = _step(cv[:], cb, p1, p2)
        cv[:] = nv
        tot = nv + in_p[r].astype(cdt)
        if diag:
            nd1 = _step(_shift_cols(cd1[:], -1), cb, p1, p2)   # up-left
            nd2 = _step(_shift_cols(cd2[:], +1), cb, p1, p2)   # up-right
            cd1[:] = nd1
            cd2[:] = nd2
            tot = tot + nd1 + nd2
        out[r] = wta12(tot).astype(sdt)
        return 0

    jax.lax.fori_loop(0, k, body, 0)


def _wta_kernel(in_t, out, *, k: int, d_real: int, compute):
    """Standalone fused WTA over an (H, W, D) volume (right-image pass);
    channel-packed output like _vertical_bwd_kernel."""
    def body(kk, _):
        tot = in_t[kk].astype(compute)
        six = _wta_rows(tot, d_real, compute)
        zero = jnp.zeros_like(six[0])
        out[kk] = jnp.stack([v.astype(compute) for v in six]
                            + [zero] * (_WTA_CH - 6)).astype(out.dtype)
        return 0

    jax.lax.fori_loop(0, k, body, 0)


def _pad_to(x, mults):
    """Pad (H, W, D) to multiples.  D-axis padding uses _BIG (acts like
    extra always-losing disparities: their aggregated value stays near
    _BIG + P2, never below any real lane); H/W padding uses a uniform
    constant, which is exactly path-restart semantics at the pad boundary."""
    pd = (-x.shape[2]) % mults[2]
    if pd:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pd)),
                    constant_values=jnp.asarray(_BIG, x.dtype))
    pads = ((0, (-x.shape[0]) % mults[0]), (0, (-x.shape[1]) % mults[1]),
            (0, 0))
    if any(p[1] for p in pads):
        x = jnp.pad(x, pads, constant_values=jnp.asarray(64, x.dtype))
    return x


def _horizontal_pass(ch, p1, p2, storage, compute, vmem, interpret,
                     packed=False):
    """Left->right and right->left paths over an already-padded volume;
    returns the two (Hp, Wp, Dp) volumes.  packed: row-pair int32 volume
    (leading axis counts packed rows; carries hold 2x rows)."""
    Hp, Wp, Dp = ch.shape
    KH = 16           # sublane tile; also the unroll factor (compile size)
    bsz = 2 if storage == jnp.int16 else 4
    align = 8 if packed else 16
    hb_max = max(align, (8 << 20) // (KH * Dp * bsz))
    HB = Hp
    nb = 1
    while HB > hb_max:      # smallest row-band split that divides Hp
        nb += 1
        while Hp % nb or (Hp // nb) % align:
            nb += 1
        HB = Hp // nb
    gh, gw = Hp // HB, Wp // KH
    carry_rows = 2 * HB if packed else HB
    kern_h = functools.partial(_horizontal_kernel, k=KH, p1=int(p1),
                               p2=int(p2), packed=packed)
    out_hf, out_hb = pl.pallas_call(
        kern_h,
        grid=(gh, gw),
        in_specs=[
            pl.BlockSpec((HB, KH, Dp), lambda h, i: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HB, KH, Dp), lambda h, i, _g=gw: (h, _g - 1 - i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((HB, KH, Dp), lambda h, i: (h, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((HB, KH, Dp), lambda h, i, _g=gw: (h, _g - 1 - i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((Hp, Wp, Dp), storage)] * 2,
        scratch_shapes=[pltpu.VMEM((carry_rows, Dp), compute)] * 2,
        compiler_params=vmem,
        interpret=interpret,
    )(ch, ch)
    return out_hf, out_hb


def _row_specs(KV, Wp, Dp, gv, reverse: bool):
    if reverse:
        return pl.BlockSpec((KV, Wp, Dp), lambda i, _g=gv: (_g - 1 - i, 0, 0),
                            memory_space=pltpu.VMEM)
    return pl.BlockSpec((KV, Wp, Dp), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _kv_for(W: int, D: int, storage) -> int:
    """Rows per vertical grid step: a power of two in [8, 64] under a ~4MB
    input block budget.

    Block size is NOT a throughput lever here: Pallas block DMA on this
    platform is ELEMENT-rate-limited (~22 G elements/s for int8/int16/
    int32 alike, measured round 3 with pure-copy kernels at KV 16/64/128
    — vs 100 Gel/s for an XLA elementwise pass), so only the number of
    element-passes over the volume matters; see the lane-packing in
    aggregate_wta_pallas."""
    bsz = 2 if storage == jnp.int16 else 4
    kv_budget = max(8, (4 << 20) // ((-(-W // 16) * 16) * max(D, 128) * bsz))
    KV = 64
    while KV > kv_budget:
        KV //= 2
    return KV


def _vertical_setup(cost, storage):
    """Common padding + KV selection for the vertical kernels.  One padding
    (multiple of max(16, KV)) serves the horizontal and vertical kernels;
    a volume already in this layout (census_cost_pallas) pads as a no-op."""
    H, W, D = cost.shape
    KV = _kv_for(W, D, storage)
    cv = _pad_to(cost, (max(16, KV), 16, 128))
    return cv, KV


def _partial_sum(cv, KV, p1, p2, diag, storage, compute, vmem, interpret,
                 packed=False):
    """Kernels 1+2: horizontal pair, then vertical fwd folding hf+hb in."""
    Hp, Wp, Dp = cv.shape
    gv = Hp // KV
    out_hf, out_hb = _horizontal_pass(cv, p1, p2, storage, compute, vmem,
                                      interpret, packed=packed)
    kern_f = functools.partial(_vertical_fwd_kernel, k=KV, p1=int(p1),
                               p2=int(p2), diag=diag, packed=packed)
    return pl.pallas_call(
        kern_f,
        grid=(gv,),
        in_specs=[_row_specs(KV, Wp, Dp, gv, False)] * 3,
        out_specs=_row_specs(KV, Wp, Dp, gv, False),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp, Dp), storage),
        scratch_shapes=[pltpu.VMEM((Wp, Dp), compute)] * 3,
        compiler_params=vmem,
        interpret=interpret,
    )(cv, out_hf, out_hb)


@functools.partial(jax.jit, static_argnames=("p1", "p2", "num_paths",
                                             "interpret", "storage",
                                             "real_shape", "packed"))
def aggregate_wta_pallas(cost, p1: int = 10, p2: int = 120,
                         num_paths: int = 8, interpret: bool = False,
                         storage=jnp.float32, real_shape=None,
                         packed: bool = False):
    """Fused 4/8-path SGM aggregation + BOTH winner-takes-all passes.

    Three kernels, five HBM passes over the volume total, and the summed
    volume never goes back to HBM:
      1. horizontal pair (2 passes: fwd+bwd walks) -> hf, hb
      2. vertical fwd (+down diagonals), folding hf+hb in -> partial
      3. vertical bwd (+up diagonals) -> complete total per row slab, with
         the fused left-image WTA reductions (c0/best/c1/cm/cc/cp) AND the
         right-image ones (via the in-VMEM diagonal skew cost_r(x, d) =
         total(x+d, d)) computed while the slab is in VMEM.

    packed=True: the volume lives in HBM as row-pair-packed int32 (two
    16-bit cost values per element — lo = row 2i, hi = row 2i+1).  Pallas
    block DMA on this platform is ELEMENT-rate-limited (~22 G elements/s
    for every dtype), so packing halves the cost of every volume pass.
    An int32 `cost` is taken as already packed (census_cost_pallas
    packed=True output, `real_shape` required); any other dtype is padded
    and packed here.

    Returns (wta_left, wta_right) dicts of (H, W) maps.  `real_shape`
    gives the true (H, W, D) when `cost` is already padded
    (census_cost_pallas output).
    """
    H, W, D = real_shape or cost.shape
    if packed:
        storage = jnp.int32
        compute = jnp.float32       # int32 VPU math is ~2.5x slower (_pack2f)
        KV = _kv_for(W, D, jnp.int32)
        if cost.dtype != jnp.int32:        # raw (H, W, D) volume: pack here
            cvu = _pad_to(cost.astype(jnp.int32),
                          (2 * max(8, KV), 16, 128))
            cost = _pack_rows(cvu)
        cv = cost
    else:
        compute = (jnp.int32 if jnp.issubdtype(storage, jnp.integer)
                   else storage)
        cost = cost.astype(storage)
        cv, KV = _vertical_setup(cost, storage)

    vmem = pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024)
    Hp, Wp, Dp = cv.shape
    gv = Hp // KV
    diag = num_paths >= 8
    partial = _partial_sum(cv, KV, p1, p2, diag, storage, compute, vmem,
                           interpret, packed=packed)

    kern_b = functools.partial(_vertical_bwd_kernel, k=KV, p1=int(p1),
                               p2=int(p2), diag=diag, d_real=D, w_real=W,
                               packed=packed)
    pk = pl.pallas_call(
        kern_b,
        grid=(gv,),
        in_specs=[_row_specs(KV, Wp, Dp, gv, True)] * 2,
        out_specs=pl.BlockSpec((KV, _WTA_CH, Wp),
                               lambda i, _g=gv: (_g - 1 - i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, _WTA_CH, Wp), storage),
        scratch_shapes=[pltpu.VMEM((Wp, Dp), compute)] * 3,
        compiler_params=vmem,
        interpret=interpret,
    )(cv, partial)

    if packed:
        pk = _unpack_rows(pk, 2 * Hp)      # (2*Hp, 16, Wp) int32
    names = ("c0", "best", "c1", "cm", "cc", "cp")
    wta_l = {k: _unpack_px(pk, c, H, W) for c, k in enumerate(names)}
    wta_r = {k: _unpack_px(pk, 6 + c, H, W)
             for c, k in enumerate(names)}
    return wta_l, wta_r


def _unpack_px(packed, ch: int, H: int, W: int):
    """Slice one channel map out of the (Hp, 16, Wp) packed WTA output."""
    v = packed[:H, ch, :W]
    return v.astype(jnp.int32) if ch % 6 == 1 else v


@functools.partial(jax.jit, static_argnames=("interpret",))
def wta_pallas(vol, interpret: bool = False):
    """Standalone fused WTA over an (H, W, D) volume in ONE HBM read
    (right-image disparity pass).  Returns dict of (H, W) maps."""
    H, W, D = vol.shape
    storage = vol.dtype
    compute = jnp.int32 if jnp.issubdtype(storage, jnp.integer) else storage
    bsz = 2 if storage == jnp.int16 else 4
    kv_budget = max(8, (4 << 20) // ((-(-W // 16) * 16) * max(D, 128) * bsz))
    KV = 64
    while KV > kv_budget:
        KV //= 2
    vp = _pad_to(vol, (max(16, KV), 16, 128))
    Hp, Wp, Dp = vp.shape
    gv = Hp // KV
    kern = functools.partial(_wta_kernel, k=KV, d_real=D, compute=compute)
    packed = pl.pallas_call(
        kern,
        grid=(gv,),
        in_specs=[_row_specs(KV, Wp, Dp, gv, False)],
        out_specs=pl.BlockSpec((KV, _WTA_CH, Wp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, _WTA_CH, Wp), storage),
        scratch_shapes=[],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(vp)
    names = ("c0", "best", "c1", "cm", "cc", "cp")
    return {k: _unpack_px(packed, c, H, W) for c, k in enumerate(names)}


def _census_cost_kernel(l_a, l_b, r_a, r_b, out, *, k: int, h_real: int,
                        w_real: int, d_real: int, win_h: int, win_w: int,
                        r_pad: int, packed: bool):
    """Fused census transform + Hamming cost volume, one output write.

    Each grid step sees two ADJACENT k-row image blocks (the census window
    needs win_h//2 rows of context; overlapping BlockSpecs are illegal, so
    the overlap is stitched from block i and block i+1).  The disparity
    axis is built in a (D, W) orientation — cl broadcast over sublanes,
    cr[x-d] per sublane d via a log2(D) lane barrel shifter — then each
    row slab is transposed to the (W, D) layout the aggregation kernels
    consume.  Replaces ~2 GB of XLA broadcast/pad/reshape/transpose
    traffic with tiny image reads + ONE volume write.
    """
    rw, rh = win_w // 2, win_h // 2
    W = w_real
    r0 = pl.program_id(0) * k

    def census(a, b):
        """(k, W) uint32 census word pair; bit = center > neighbour."""
        S = jnp.concatenate([a[:], b[:]], axis=0)   # (2k, W + 2*rw [+pad])
        ctr = S[rh:rh + k, rw:rw + W]
        lo = jnp.zeros(ctr.shape, jnp.uint32)
        hi = jnp.zeros(ctr.shape, jnp.uint32)
        bit = 0
        for dy in range(win_h):
            for dx in range(win_w):
                if dy == rh and dx == rw:
                    continue
                nb = S[dy:dy + k, dx:dx + W]
                word = (ctr > nb).astype(jnp.uint32) << jnp.uint32(bit % 32)
                if bit < 32:
                    lo = lo | word
                else:
                    hi = hi | word
                bit += 1
        return lo, hi

    cl_lo, cl_hi = census(l_a, l_b)
    cr_lo, cr_hi = census(r_a, r_b)

    D = out.shape[-1]
    Wp = out.shape[1]
    sdt = out.dtype
    # (W, D) orientation DIRECTLY: x on sublanes, d on lanes — the layout
    # the aggregation kernels consume.  The previous (D, W) build needed a
    # (D, W)->(W, D) transpose per row, which measured as the census
    # kernel's dominant cost (3.8 ms vs its 0.95 ms DMA ledger share at
    # 512x640x128; round-5 stage profile).
    lane_d = jax.lax.broadcasted_iota(jnp.int32, (W, D), 1)
    sub_x = jax.lax.broadcasted_iota(jnp.int32, (W, D), 0)

    def shift_r(rowT):
        """(W, D) slab with out[x, d] = rowT[x, 0] shifted: out[x, d] =
        row[x - d], via a log2(D) SUBLANE barrel shifter (per-lane bit
        selection).  rowT: (W, 1)."""
        v = jnp.broadcast_to(rowT, (W, D))
        step = 1
        while step < D:
            if step >= W:
                shifted = jnp.zeros((W, D), v.dtype)
            else:
                shifted = jnp.concatenate(
                    [jnp.zeros((step, D), v.dtype), v[:-step]], axis=0)
            v = jnp.where((lane_d & step) != 0, shifted, v)
            step *= 2
        return v

    cdt = jnp.int32 if packed else sdt
    prev_row = [None]
    for kk in range(k):       # static: sublane slices of the census slabs
        # (1, W) -> (W, 1) single-row transposes (cheap; the (D, W) full
        # slab transpose this layout removes was the measured hotspot)
        a_lo = jnp.broadcast_to(
            jnp.swapaxes(cl_lo[kk:kk + 1, :], 0, 1), (W, D))
        a_hi = jnp.broadcast_to(
            jnp.swapaxes(cl_hi[kk:kk + 1, :], 0, 1), (W, D))
        b_lo = shift_r(jnp.swapaxes(cr_lo[kk:kk + 1, :], 0, 1))
        b_hi = shift_r(jnp.swapaxes(cr_hi[kk:kk + 1, :], 0, 1))
        ham = (jax.lax.population_count((a_lo ^ b_lo).astype(jnp.int32))
               + jax.lax.population_count((a_hi ^ b_hi).astype(jnp.int32))
               ).astype(cdt)
        # out-of-range disparities (x < d) -> 64; real-D overflow -> _BIG
        ham = jnp.where(sub_x < lane_d, jnp.asarray(64, cdt), ham)
        ham = jnp.where(lane_d >= d_real, jnp.asarray(_BIG, cdt), ham)
        # pad rows -> UNIFORM 64 across all lanes (path-restart semantics
        # at the boundary; matches _pad_to's pad order)
        hamT = jnp.where(r0 + kk >= h_real, jnp.asarray(64, cdt), ham)
        if Wp > W:
            hamT = jnp.concatenate(
                [hamT, jnp.full((Wp - W, D), 64, cdt)], axis=0)
        if packed:
            if kk % 2:
                out[kk // 2] = _pack2(prev_row[0], hamT)
            else:
                prev_row[0] = hamT
        else:
            out[kk] = hamT


@functools.partial(jax.jit, static_argnames=("max_disp", "interpret",
                                             "storage", "win_h", "win_w",
                                             "packed"))
def census_cost_pallas(left, right, max_disp: int, interpret: bool = False,
                       storage=jnp.float32, win_h: int = 9, win_w: int = 7,
                       packed: bool = False):
    """Census + Hamming cost volume (ref census_transform.cu semantics),
    emitted directly in the padded layout the aggregation kernels consume
    (D pads = _BIG, H/W pads = 64).  Returns the (Hp, Wp, Dp) volume; pass
    real_shape=(H, W, max_disp) to aggregate_wta_pallas.

    packed=True: emit the row-pair-packed int32 volume ((Hp/2, Wp, Dp),
    rows 2i/2i+1 in the lo/hi 16 bits) that aggregate_wta_pallas
    packed=True consumes — half the elements through the element-rate-
    limited block DMA."""
    H, W = left.shape
    D = max_disp
    if packed:
        storage = jnp.int32
    KV = _kv_for(W, D, storage)
    mh = max(16, 2 * KV) if packed else max(16, KV)
    Hp = -(-H // mh) * mh
    Wp = -(-W // 16) * 16
    Dp = -(-D // 128) * 128
    rh, rw = win_h // 2, win_w // 2
    k = 16                    # census block rows (static unroll)
    # zero-pad host-side (tiny vs the volume): rh rows of context on top,
    # enough below that block i+1 always exists; rw cols each side, lanes
    # padded to a 128 multiple
    gv = Hp // k
    HpR = (gv + 1) * k
    w6p = (-(W + 2 * rw)) % 128
    lp = jnp.pad(left, ((rh, HpR - H - rh), (rw, rw + w6p)))
    rp = jnp.pad(right, ((rh, HpR - H - rh), (rw, rw + w6p)))
    kern = functools.partial(_census_cost_kernel, k=k, h_real=H, w_real=W,
                             d_real=D, win_h=win_h, win_w=win_w,
                             r_pad=rw + w6p, packed=packed)
    WI = lp.shape[1]
    blk_a = pl.BlockSpec((k, WI), lambda i: (i, 0), memory_space=pltpu.VMEM)
    blk_b = pl.BlockSpec((k, WI), lambda i: (i + 1, 0),
                         memory_space=pltpu.VMEM)
    ko = k // 2 if packed else k
    Ho = Hp // 2 if packed else Hp
    return pl.pallas_call(
        kern,
        grid=(gv,),
        in_specs=[blk_a, blk_b, blk_a, blk_b],
        out_specs=_row_specs(ko, Wp, Dp, gv, False),
        out_shape=jax.ShapeDtypeStruct((Ho, Wp, Dp), storage),
        scratch_shapes=[],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        interpret=interpret,
    )(lp, lp, rp, rp)


def _vertical_bwd_total_kernel(in_c, in_p, out_t, cv, cd1, cd2,
                               *, k: int, p1: int, p2: int, diag: bool):
    """Up (+up diagonals) added onto the forward partial sum, emitting the
    full aggregated volume (parity-test / volume-consumer API)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for ref in (cv, cd1, cd2):
            ref[:] = jnp.full_like(ref, _BIG)

    sdt = out_t.dtype
    cdt = cv.dtype

    def body(kk, _):
        r = k - 1 - kk
        cb = in_c[r].astype(cdt)
        nv = _step(cv[:], cb, p1, p2)
        cv[:] = nv
        tot = nv + in_p[r].astype(cdt)
        if diag:
            nd1 = _step(_shift_cols(cd1[:], -1), cb, p1, p2)   # up-left
            nd2 = _step(_shift_cols(cd2[:], +1), cb, p1, p2)   # up-right
            cd1[:] = nd1
            cd2[:] = nd2
            tot = tot + nd1 + nd2
        out_t[r] = tot.astype(sdt)
        return 0

    jax.lax.fori_loop(0, k, body, 0)


@functools.partial(jax.jit, static_argnames=("p1", "p2", "num_paths",
                                             "interpret", "storage"))
def aggregate_paths_pallas(cost, p1: int = 10, p2: int = 120,
                           num_paths: int = 8, interpret: bool = False,
                           storage=jnp.int16):
    """Sum of 4/8 directional SGM aggregations over an (H, W, D) cost
    volume.  Returns (H, W, D) in the storage dtype.  (Volume-only API,
    kept for parity tests; the full pipeline uses aggregate_wta_pallas,
    which never writes the summed volume to HBM.)"""
    H, W, D = cost.shape
    compute = jnp.int32 if jnp.issubdtype(storage, jnp.integer) else storage
    cost = cost.astype(storage)
    vmem = pltpu.CompilerParams(vmem_limit_bytes=120 * 1024 * 1024)
    cv, KV = _vertical_setup(cost, storage)
    Hp, Wp, Dp = cv.shape
    gv = Hp // KV
    diag = num_paths >= 8
    partial = _partial_sum(cv, KV, p1, p2, diag, storage, compute, vmem,
                           interpret)
    kern_b = functools.partial(_vertical_bwd_total_kernel, k=KV, p1=int(p1),
                               p2=int(p2), diag=diag)
    total = pl.pallas_call(
        kern_b,
        grid=(gv,),
        in_specs=[_row_specs(KV, Wp, Dp, gv, True)] * 2,
        out_specs=_row_specs(KV, Wp, Dp, gv, True),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp, Dp), storage),
        scratch_shapes=[pltpu.VMEM((Wp, Dp), compute)] * 3,
        compiler_params=vmem,
        interpret=interpret,
    )(cv, partial)
    return total[:H, :W, :D]
