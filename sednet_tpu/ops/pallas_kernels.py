"""Pallas TPU kernels for the O(N^2) hot loops.

mean_shift_step: one fused mean-shift iteration
    new_X <- rownorm( (K @ X) / K.1 ),  K = exp(-(2 - 2 q.X^T) / (2 b^2))
Flash-attention-style streaming: the (N x N) kernel matrix never touches
HBM — each (row-block x col-block) tile of K lives briefly in VMEM, feeding
an accumulated numerator (RB, E) and denominator (RB, 1). The pure-XLA
version (reference semantics: src/mean_shift.py:45-79) writes ~2*N^2*4 bytes
per iteration; at N=10k, 50 iterations that is ~40 GB of HBM traffic this
kernel eliminates.

The exponent is clamped at -75 like the reference's guard_exp
(src/guard.py:7-10); since inputs are unit vectors the argument is <= 0, so
no +clamp is needed.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _ms_kernel(inv2b2_ref, n_valid_ref, q_ref, x_ref, out_ref,
               num_acc, den_acc):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        num_acc[:] = jnp.zeros_like(num_acc)
        den_acc[:] = jnp.zeros_like(den_acc)

    q = q_ref[:]                                   # (RB, E)
    x = x_ref[:]                                   # (CB, E)
    # inputs may arrive in bf16 (opt-in ms_bf16). MEASURED (round 3): a
    # no-op for the MXU — default Mosaic matmul precision already rounds
    # f32 dot inputs to bf16 with f32 accumulation (bitwise-equal
    # outputs, 0.33 vs 0.34 ms/iter); bf16 only halves tile bytes.
    s = lax.dot_general(q, x, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)  # (RB, CB)
    arg = jnp.maximum((s - 1.0) * inv2b2_ref[0, 0], -75.0)
    k = jnp.exp(arg)
    # mask padded columns (fake zero points)
    cb = x.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, cb), 1) + j * cb
    k = jnp.where(col < n_valid_ref[0, 0], k, 0.0)

    num_acc[:] += jnp.dot(k.astype(x.dtype), x,
                          preferred_element_type=jnp.float32)
    den_acc[:] += jnp.sum(k, axis=1, keepdims=True)

    @pl.when(j == nj - 1)
    def _():
        out = num_acc[:] / jnp.maximum(den_acc[:], 1e-30)
        norm = jnp.sqrt(jnp.maximum(jnp.sum(out * out, 1, keepdims=True),
                                    1e-24))
        out_ref[:] = out / norm


# NOTE: keep in sync with _ms_kernel above — the bodies are intentionally
# twinned (only the ref indexing / grid axis differ); any change to the
# exponent clamps, masking or normalization epsilons must land in BOTH.
def _ms_kernel_batched(inv2b2_ref, n_valid_ref, q_ref, x_ref, out_ref,
                       num_acc, den_acc):
    b = pl.program_id(0)
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        num_acc[:] = jnp.zeros_like(num_acc)
        den_acc[:] = jnp.zeros_like(den_acc)

    q = q_ref[0]                                   # (RB, E)
    x = x_ref[0]                                   # (CB, E)
    s = lax.dot_general(q, x, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)
    arg = jnp.maximum((s - 1.0) * inv2b2_ref[b, 0], -75.0)
    k = jnp.exp(arg)
    cb = x.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (1, cb), 1) + j * cb
    k = jnp.where(col < n_valid_ref[0, 0], k, 0.0)

    num_acc[:] += jnp.dot(k.astype(x.dtype), x,
                          preferred_element_type=jnp.float32)
    den_acc[:] += jnp.sum(k, axis=1, keepdims=True)

    @pl.when(j == nj - 1)
    def _():
        out = num_acc[:] / jnp.maximum(den_acc[:], 1e-30)
        norm = jnp.sqrt(jnp.maximum(jnp.sum(out * out, 1, keepdims=True),
                                    1e-24))
        out_ref[0] = out / norm


@functools.partial(jax.jit,
                   static_argnames=("row_block", "col_block", "bf16", "interpret"))
def mean_shift_step_pallas_batched(new_x: jax.Array, x: jax.Array,
                                   bandwidth: jax.Array, *,
                                   row_block: int = 512,
                                   col_block: int = 1024,
                                   bf16: bool = False,
                                   interpret: bool = False) -> jax.Array:
    """Batched fused mean-shift update: new_x, x (B, N, E) unit rows;
    bandwidth (B,). One kernel launch clusters every shape in the batch —
    the batch axis is an extra parallel grid dimension. bf16=True runs
    the two tile matmuls on bf16 inputs with f32 accumulation (opt-in,
    see config.ms_bf16; output stays f32)."""
    bsz, n, e = x.shape
    rb = min(row_block, _round_up(n, 8))
    cb = min(col_block, _round_up(n, 128))
    n_rows = _round_up(n, rb)
    n_cols = _round_up(n, cb)
    dt = jnp.bfloat16 if bf16 else jnp.float32
    q_pad = jnp.pad(new_x, ((0, 0), (0, n_rows - n), (0, 0))).astype(dt)
    x_pad = jnp.pad(x, ((0, 0), (0, n_cols - n), (0, 0))).astype(dt)
    inv2b2 = (1.0 / (bandwidth * bandwidth)).reshape(bsz, 1).astype(
        jnp.float32)
    n_valid = jnp.full((1, 1), n, jnp.int32)

    out = pl.pallas_call(
        _ms_kernel_batched,
        grid=(bsz, n_rows // rb, n_cols // cb),
        in_specs=[
            pl.BlockSpec((bsz, 1), lambda b, i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda b, i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rb, e), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb, e), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, rb, e), lambda b, i, j: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, n_rows, e), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rb, e), jnp.float32),
            pltpu.VMEM((rb, 1), jnp.float32),
        ],
        interpret=interpret,
    )(inv2b2, n_valid, q_pad, x_pad)
    return out[:, :n]


def _colmax_kernel(thresh_ref, gain_ref, rows_ref, cols_ref, bias_ref,
                   best_ref, idx_ref):
    """One (RB, CB) tile of the NMS column-max scan (see colmax_pallas)."""
    j = pl.program_id(1)
    cb = cols_ref.shape[0]

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.full_like(best_ref, -jnp.inf)
        idx_ref[:] = jnp.zeros_like(idx_ref)

    sim = lax.dot_general(rows_ref[:], cols_ref[:], (((1,), (1,)), ((), ())),
                          preferred_element_type=jnp.float32)  # (RB, CB)
    # unified pass scoring: within-threshold columns score gain*sim + bias,
    # the rest -inf (padded columns carry bias = -inf)
    scored = jnp.where(2.0 - 2.0 * sim < thresh_ref[0, 0],
                       gain_ref[0, 0] * sim + bias_ref[:],
                       -jnp.inf)
    val = jnp.max(scored, axis=1, keepdims=True)                  # (RB, 1)
    colid = jax.lax.broadcasted_iota(jnp.int32, scored.shape, 1) + j * cb
    # first-index tie semantics (jnp.argmax): min col id among the maxima
    loc = jnp.min(jnp.where(scored == val, colid, jnp.int32(2 ** 30)),
                  axis=1, keepdims=True)                          # (RB, 1)
    take = val > best_ref[:]  # strict >: earlier tiles win ties
    idx_ref[:] = jnp.where(take, loc, idx_ref[:])
    best_ref[:] = jnp.where(take, val, best_ref[:])


@functools.partial(jax.jit,
                   static_argnames=("row_block", "col_block", "interpret"))
def colmax_pallas(rows: jax.Array, cols: jax.Array, bias: jax.Array,
                  thresh: jax.Array, gain: jax.Array, *,
                  row_block: int = 512, col_block: int = 1024,
                  interpret: bool = False):
    """Fused NMS column-max: for every row r of `rows` (R, E), over columns
    c of `cols` (C, E) with sim = rows @ cols^T,
        scored[r, c] = gain*sim + bias[c]  if (2 - 2*sim[r, c]) < thresh
                       -inf                otherwise
    returns (max_c scored[r, :], first argmax) — the exact tile-streamed
    semantics of mean_shift._blocked_colmax, but the (R, C) similarity
    matrix never leaves VMEM (the XLA form writes + re-reads ~400 MB per
    pass at N=10k). thresh/gain are traced scalars so one compiled kernel
    serves all three NMS passes (membership / bandwidth-ball vote /
    surviving-center assignment)."""
    r, e = rows.shape
    c = cols.shape[0]
    rb = min(row_block, _round_up(r, 8))
    cb = min(col_block, _round_up(c, 128))
    r_pad = _round_up(r, rb)
    c_pad = _round_up(c, cb)
    rows_p = jnp.pad(rows, ((0, r_pad - r), (0, 0)))
    cols_p = jnp.pad(cols, ((0, c_pad - c), (0, 0)))
    bias_p = jnp.pad(bias.astype(jnp.float32), (0, c_pad - c),
                     constant_values=-jnp.inf).reshape(1, c_pad)
    thresh = jnp.asarray(thresh, jnp.float32).reshape(1, 1)
    gain = jnp.asarray(gain, jnp.float32).reshape(1, 1)

    best, idx = pl.pallas_call(
        _colmax_kernel,
        grid=(r_pad // rb, c_pad // cb),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((rb, e), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, e), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cb), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((rb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((r_pad, 1), jnp.float32),
                   jax.ShapeDtypeStruct((r_pad, 1), jnp.int32)],
        interpret=interpret,
    )(thresh, gain, rows_p, cols_p, bias_p)
    return best[:r, 0], idx[:r, 0]


def _segsum_scan_kernel(prev_dest_ref, vals_ref, dest_ref, out_ref,
                        carry_ref):
    """One (m_pad, T) tile of the sorted-segment inclusive scan.

    Grid is sequential over tiles; `carry_ref` (VMEM (m_pad, 1)) holds the
    running sum of the segment that crosses the tile boundary, and
    `prev_dest_ref` (SMEM, the WHOLE (n_tiles, 1) array — Mosaic rejects
    sub-array SMEM blocks whose dims neither match the array nor are
    (8, 128)-divisible, so every step sees the full table and indexes it
    with program_id) holds the LAST destination id of the previous tile
    so the carry can be applied with a plain broadcast compare — no
    scalar extraction from VMEM anywhere."""
    i = pl.program_id(0)
    t = vals_ref.shape[1]

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    x = vals_ref[:]                                   # (m_pad, T) f32
    dest = dest_ref[:]                                # (1, T) int32
    # intra-tile inclusive segmented scan: log2(T) shift + masked-add
    # passes, entirely in VMEM/registers (the XLA form of this loop costs
    # a full HBM pass per shift — ceil(log2(E)) * 2 * E * m * 4 bytes).
    # Shifts are LANE ROTATES (pltpu.roll) with an iota guard against the
    # wrap — jnp.pad of a sub-tile vector is an "Invalid vector register
    # cast" in this Mosaic build (round-4 finding; pads only legalize at
    # tile-aligned sizes, rolls always do).
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, t), 1)
    s = 1
    while s < t:
        x_sh = pltpu.roll(x, s, 1)                    # x_sh[:, l] = x[:, l-s]
        d_sh = pltpu.roll(dest, s, 1)
        ok = (lane >= s) & (dest == d_sh)             # same segment, no wrap
        x = x + jnp.where(ok, x_sh, 0.0)
        s *= 2
    # cross-tile carry: lanes still in the previous tile's last segment
    cont = dest == prev_dest_ref[i, 0]                # (1, T)
    x = x + jnp.where(cont, carry_ref[:], 0.0)
    carry_ref[:] = x[:, t - 1:t]
    out_ref[:] = x


def _segsum_mxu_kernel(prev_dest_ref, vals_ref, dest_ref, dest_col_ref,
                       out_ref, carry_ref):
    """One (m_pad, T) tile of the sorted-segment sum via ONE MXU matmul.

    Written to attack the round-4 profile's "48 ms at E=500k" figure for
    the roll-scan kernel above (log2(T) cross-tile LANE ROTATES per tile
    looked like the cost). The amortized A/B (50 kernel calls chained in
    one jit, idle host) refuted that read: roll is 13.3 ms/call and this
    matmul variant 14.7 ms/call at E=500k — the 48 ms was ~35 ms of
    per-dispatch relay overhead on top of a ~13 ms kernel, and the rolls
    are NOT the bottleneck. Kept as a tested alternative ("mxu" method)
    and a recorded negative result; "roll" stays the default. The idea:
    replace the scan with a one-hot equality matmul:
        M[c, r] = (dest[c] == dest[r])        (T, T), symmetric
        x = vals @ M                          (m_pad, T)
    so EVERY member of a segment receives the full tile-local segment sum
    (not an inclusive prefix). That is sufficient: the caller only reads
    segment-FINAL positions (via `ends`), where tile-local-sum + carry is
    exactly the inclusive value the scan kernel produced. Multiplications
    are by exactly 0/1 (exact at any MXU precision decomposition) and
    accumulation is f32, so the result is the same pairwise-exact sum
    class as the scan, reassociated.

    The carry logic is IDENTICAL to _segsum_scan_kernel: lanes whose dest
    matches the previous tile's last dest get the running carry added, and
    the next carry is the last lane's value (tile-local sum of the
    boundary segment + inherited carry — correct across any number of
    spanned tiles)."""
    i = pl.program_id(0)
    t = vals_ref.shape[1]

    @pl.when(i == 0)
    def _():
        carry_ref[:] = jnp.zeros_like(carry_ref)

    dest = dest_ref[:]                                # (1, T) int32
    m = (dest_col_ref[:] == dest).astype(jnp.float32)  # (T, T) one-hot eq
    x = lax.dot_general(vals_ref[:], m, (((1,), (0,)), ((), ())),
                        precision=lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)  # (m_pad, T)
    cont = dest == prev_dest_ref[i, 0]                # (1, T)
    x = x + jnp.where(cont, carry_ref[:], 0.0)
    carry_ref[:] = x[:, t - 1:t]
    out_ref[:] = x


@functools.partial(jax.jit, static_argnames=("tile", "interpret", "method"))
def segsum_sorted_scan_pallas(vals_t: jax.Array, dest: jax.Array,
                              ends: jax.Array, *, tile: int = 2048,
                              interpret: bool = False,
                              method: str = "roll") -> jax.Array:
    """Exact segment sum of rows grouped by SORTED destination ids, as ONE
    streaming Pallas pass (the TPU route past both pathological XLA
    lowerings: scatter-add and the 19-pass whole-array segmented scan —
    see cluster.spectral._segment_sum_sorted_scan, which this replaces on
    TPU for the matfree LOBPCG transpose matvec).

    vals_t: (m, E) f32 — entry values, TRANSPOSED so the long entry axis
        rides the 128-lane dimension (m ~ a LOBPCG block width of 12-36
        pads to sublanes, not to 128 lanes);
    dest:   (E,) int32 ascending destination ids (padding uses -1);
    ends:   (N,) int32 cumulative per-destination counts
        (_sorted_transpose_layout).

    Returns (N, m) f32: per-destination sums, 0 for empty destinations.
    Exactness: every partial is a plain pairwise ADD of entries (no
    cumsum-difference anywhere), so the quirk-mode affinity's 1e6 dynamic
    range loses nothing. Association differs from the whole-array XLA
    scan only for segments that CROSS a tile boundary (tree within each
    tile + sequential carry across tiles) — a last-ulp reordering of the
    same sums, bounded like any blocked reduction.
    Traffic: one read + one write of the (m, E) entries (vs 19 full
    read+write passes), then one (N,)-gather of the segment tails.

    method selects the intra-tile reduction: "roll" (default) is the
    log2(T) lane-rotate inclusive scan; "mxu" does ONE one-hot equality
    matmul per tile on the MXU (_segsum_mxu_kernel). Amortized A/B at
    E=500k: roll 13.3 ms, mxu 14.7 ms — the matmul variant is exact but
    no faster, so roll stays the default (see _segsum_mxu_kernel)."""
    if method not in ("mxu", "roll"):
        raise ValueError(f"unknown segsum method {method!r}")
    m, e = vals_t.shape
    n = ends.shape[0]
    m_pad = _round_up(m, 8)
    if method == "mxu":
        # the (T, T) one-hot matmul operand caps the tile: 1024^2 f32 =
        # 4 MB of VMEM; 2048 would need 16 MB
        tile = min(tile, 1024)
    e_pad = _round_up(e, tile)
    vals_p = jnp.pad(vals_t, ((0, m_pad - m), (0, e_pad - e)))
    dest_p = jnp.pad(dest.astype(jnp.int32), (0, e_pad - e),
                     constant_values=-1).reshape(1, e_pad)
    # last dest of the PREVIOUS tile (tile 0 gets -2: matches nothing)
    n_tiles = e_pad // tile
    prev_dest = jnp.concatenate([
        jnp.full((1,), -2, jnp.int32),
        dest_p[0, tile - 1::tile][:n_tiles - 1]]).reshape(n_tiles, 1)

    if method == "mxu":
        scanned = pl.pallas_call(
            _segsum_mxu_kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((n_tiles, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((m_pad, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile, 1), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m_pad, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m_pad, e_pad), jnp.float32),
            scratch_shapes=[pltpu.VMEM((m_pad, 1), jnp.float32)],
            interpret=interpret,
        )(prev_dest, vals_p, dest_p, dest_p.reshape(e_pad, 1))
    else:
        scanned = pl.pallas_call(
            _segsum_scan_kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((n_tiles, 1), lambda i: (0, 0),
                             memory_space=pltpu.SMEM),
                pl.BlockSpec((m_pad, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), lambda i: (0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((m_pad, tile), lambda i: (0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((m_pad, e_pad), jnp.float32),
            scratch_shapes=[pltpu.VMEM((m_pad, 1), jnp.float32)],
            interpret=interpret,
        )(prev_dest, vals_p, dest_p)

    counts_pos = ends > jnp.concatenate(
        [jnp.zeros((1,), ends.dtype), ends[:-1]])
    last = scanned[:m, jnp.clip(ends - 1, 0, e - 1)]   # (m, N)
    return jnp.where(counts_pos[None, :], last, 0.0).T


@functools.partial(jax.jit,
                   static_argnames=("row_block", "col_block", "bf16", "interpret"))
def mean_shift_step_pallas(new_x: jax.Array, x: jax.Array,
                           bandwidth: jax.Array, *, row_block: int = 512,
                           col_block: int = 1024, bf16: bool = False,
                           interpret: bool = False) -> jax.Array:
    """One fused mean-shift update. new_x, x: (N, E) unit rows. bf16=True
    runs the tile matmuls on bf16 inputs, f32 accumulation (opt-in)."""
    n, e = x.shape
    rb = min(row_block, _round_up(n, 8))
    cb = min(col_block, _round_up(n, 128))
    n_rows = _round_up(n, rb)
    n_cols = _round_up(n, cb)
    dt = jnp.bfloat16 if bf16 else jnp.float32
    q_pad = jnp.pad(new_x, ((0, n_rows - n), (0, 0))).astype(dt)
    x_pad = jnp.pad(x, ((0, n_cols - n), (0, 0))).astype(dt)
    inv2b2 = (1.0 / (bandwidth * bandwidth)).reshape(1, 1).astype(jnp.float32)
    n_valid = jnp.full((1, 1), n, jnp.int32)

    out = pl.pallas_call(
        _ms_kernel,
        grid=(n_rows // rb, n_cols // cb),
        in_specs=[
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((rb, e), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cb, e), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rb, e), lambda i, j: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_rows, e), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((rb, e), jnp.float32),
            pltpu.VMEM((rb, 1), jnp.float32),
        ],
        interpret=interpret,
    )(inv2b2, n_valid, q_pad, x_pad)
    return out[:n]
