"""Compensated-precision (two-float) matrix products for kernel solves.

The f32 small-noise wall (r4 VERDICT #1): at extreme N the blocked Gram
matvec's float32 rounding — `eps * sqrt(N) * ||K||` of GEMM accumulation
plus the catastrophic cancellation of the `||x||^2 + ||y||^2 - 2 x.y`
distance identity near the diagonal — makes the *computed* operator
effectively indefinite once `noise < ~||K||*eps*sqrt(N)` (~0.1 at
N=262,144), and whitened CG stalls with O(1000)x-wrong solutions. The
reference never hits this wall because it runs float64 everywhere
(`/root/reference/README_without_examples.md:811-822`); this module is the
TPU-native answer: an error-compensated matvec whose application error is
~1e-10 relative instead of ~3e-5, restoring convergence far below the
plain-f32 noise floor. Measured cost at the N=262,144 north star (v5e,
8 RHS): 11.8 s vs 0.21 s per matvec (~56x) — the plain sweep is
HBM/MXU-bound while the double-float tile arithmetic is VPU-bound
(~200 f32 ops/entry at ~2 TF/s VPU) — an acceptable price for the ONLY
converging path in this regime (a representer-weights solve lands in
~500 s where the plain path returns garbage in 38 s).

Two ingredients, composable and individually testable:

1. **Cancellation-free Gram tiles** (`config.accurate_dists()` +
   `kernels.pw_dists2`): squared distances by direct differencing
   ``sum_d (x_id - y_jd)^2`` instead of the matmul identity. The identity
   loses ``eps * ||x||^2`` absolutely near the diagonal (x-range 10 ->
   entry errors ~100 eps * K_ij, *structured*, the indefiniteness
   driver); direct differencing is relatively accurate at every
   distance. Costs d elementwise passes over the (block, N) tile instead
   of one d-MAC matmul — for the small d of GP regression this is the
   same memory-bound cost class as the exp epilogue.

2. **Two-float GEMM with exact-accumulation bf16 slices**
   (:func:`compensated_matmul`): the Ozaki splitting scheme (Ozaki et
   al., Numer. Algorithms 2012; the DGEMM-on-tensor-core recipe) mapped
   to the TPU MXU. Each f32 operand is split — exactly, with pure f32
   adds — into two 8-bit-significand slices (bf16-representable) plus an
   f32 tail:

       A = A1 + A2 + Ar,   |A2| <= sigma 2^-8,  |Ar| <= sigma 2^-16

   with per-row (per-column for B) power-of-two scales ``sigma``. The
   four slice-pair products ``Ai @ Bj`` run as NATIVE bf16 MXU matmuls
   with f32 accumulators over contraction sub-blocks of 512: every
   product has <= 16 significand bits and every sub-block sum is an
   integer multiple of a common scale bounded by 2^23 — so the MXU
   accumulation is EXACT, and sub-block partials combine exactly by
   TwoSum into a hi/lo double-float pair. The O(2^-16)-relative tails
   ``Ar @ B + (A1+A2) @ Br`` need only ordinary f32 precision and fold
   into the low word. Net: the product of the f32 operands to ~1e-10
   relative, from bf16 MXU passes (the fast ones) plus two
   ordinary GEMMs.

All helpers are dtype-generic (f32 on TPU, f64 on CPU test meshes — the
f64 variant slices to 16-bit significands for the same guarantees).
"""

import math as _math

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .. import config

__all__ = [
    "two_sum",
    "two_prod",
    "split_two_slices",
    "compensated_matmul",
    "compensated_scaled_apply",
    "df32_pairwise",
    "plain_noise_wall",
    "resolve_compensated",
]


#: Auto-trigger safety factor on the formula wall ``lam_max * eps *
#: sqrt(N)``. The formula's coherent-worst-case sqrt(N) overstates the
#: practical boundary: measured on the N=262,144 v5e bench problem
#: (lam_max = 63,118 -> formula wall 3.85), the plain whitened CG WORKS
#: at noise=0.1 (= wall/38; 7 iterations to 8.8e-5) and FAILS
#: catastrophically at noise=0.01 (= wall/385; rel residual 92.8 after
#: 300 iterations). 1/64 puts the trigger at 0.060 there: the working
#: point keeps a ~1.7x margin on the plain path, the failing point
#: engages compensated with ~6x margin. (CPU f32 FMA fails later, around
#: wall/60 — between the thresholds the runtime stall warning names
#: ``compensated=True``.)
AUTO_WALL_FACTOR = 1.0 / 64.0


def plain_noise_wall(lam_max, n, dtype):
    """The plain-f32 noise validity floor ``||K|| * eps * sqrt(n)`` (with
    ``lam_max`` standing in for ``||K||`` — e.g. the top Ritz value of the
    eig-preconditioner state). Below ~this noise, the un-compensated
    blocked matvec's rounding makes the computed operator effectively
    indefinite and CG stalls."""
    import math

    return float(lam_max) * math.sqrt(float(n)) * float(jnp.finfo(dtype).eps)


def resolve_compensated(compensated, noise, lam, n, dtype, have_comp_mv):
    """Resolve a ``compensated`` policy ("auto" | True | False) to a bool.

    "auto" triggers when ``noise < AUTO_WALL_FACTOR * plain_noise_wall``
    and both quantities are concrete (host-resolvable); under a trace the
    decision is undecidable and resolves False — the runtime CG stall
    warning then points at ``compensated=True``. Explicit ``True``
    without a compensated matvec closure raises."""
    if compensated is True:
        if not have_comp_mv:
            raise ValueError(
                "compensated=True but no compensated matvec is available "
                "on this path."
            )
        return True
    if compensated in (False, None):
        return False
    if compensated != "auto":
        raise ValueError(f"compensated must be 'auto', True or False, got {compensated!r}")
    if not have_comp_mv:
        return False
    try:
        wall = AUTO_WALL_FACTOR * plain_noise_wall(
            jnp.max(jnp.asarray(lam)), n, dtype
        )
        return float(noise) < wall
    except (jax.errors.ConcretizationTypeError, jax.errors.TracerArrayConversionError, TypeError):
        return False


def two_sum(a, b):
    """Knuth's branch-free TwoSum: ``s + err == a + b`` exactly (s is the
    rounded f32/f64 sum, err the rounding error).

    CONSTANT-OPERAND HAZARD: under jit, XLA's algebraic simplifier
    reassociates constant chains — ``(x + 1) - 1 -> x`` — which silently
    zeroes the error extraction whenever ``a`` or ``b`` is a literal
    (measured: 150x tile-accuracy loss, only under jit). Callers passing
    a literal must hide it behind :func:`_opaque` (a SCALAR
    optimization_barrier — a barrier inside two_sum itself would
    materialize every tile-sized intermediate and was measured to cost
    1.5x the whole compensated matvec in HBM traffic)."""
    s = a + b
    bb = s - a
    err = (a - (s - bb)) + (b - bb)
    return s, err


def _opaque(c, dtype):
    """A literal scalar the XLA simplifier cannot constant-fold through
    (see the two_sum hazard note). The barrier is on a SCALAR — free."""
    return lax.optimization_barrier(jnp.asarray(c, dtype))


def _split_const(dtype):
    """Dekker split factor: 2^ceil(p/2) + 1 for precision-p floats."""
    if jnp.dtype(dtype) == jnp.float64:
        return 134217729.0  # 2^27 + 1
    return 4097.0  # 2^12 + 1 (float32)


def two_prod(a, b):
    """Dekker's TwoProd (no FMA): ``p + err == a * b`` exactly."""
    dtype = jnp.result_type(a, b)
    c = jnp.asarray(_split_const(dtype), dtype)
    p = a * b
    a_ = c * a
    a_hi = a_ - (a_ - a)
    a_lo = a - a_hi
    b_ = c * b
    b_hi = b_ - (b_ - b)
    b_lo = b - b_hi
    err = ((a_hi * b_hi - p) + a_hi * b_lo + a_lo * b_hi) + a_lo * b_lo
    return p, err


def _slice_params(dtype):
    """(t, slice_dtype): significand bits per slice and its storage type.

    f32 slices carry 8 bits -> exactly representable in bfloat16 (native
    MXU inputs); f64 slices carry 16 bits and stay f64 (the CPU test
    path — correctness-identical, no MXU to feed)."""
    if jnp.dtype(dtype) == jnp.float64:
        return 16, jnp.float64
    return 8, jnp.bfloat16


def split_two_slices(A, axis):
    """Split ``A`` into ``(A1, A2, Ar)`` with ``A == A1 + A2 + Ar``
    EXACTLY (as values of A's dtype): two t-bit-significand slices scaled
    per-row/column (power-of-two scales over ``axis``, the contraction
    axis) plus the full-precision tail.

    The extraction ``fl((A + M) - M)`` with ``M = 3 * 2^(p-2) * delta``
    rounds A to the nearest multiple of ``delta`` exactly in
    floating-point (both ops are exact by Sterbenz-type arguments; see
    module docstring). Entries smaller than the slice grid land wholly in
    later slices / the tail — nothing is dropped."""
    dtype = A.dtype
    t, slice_dtype = _slice_params(dtype)
    prec = 53 if jnp.dtype(dtype) == jnp.float64 else 24
    tiny = jnp.asarray(jnp.finfo(dtype).tiny, dtype)
    absmax = jnp.max(jnp.abs(A), axis=axis, keepdims=True)
    sigma = jnp.exp2(jnp.ceil(jnp.log2(jnp.maximum(absmax, tiny))))
    d1 = sigma * jnp.asarray(2.0 ** (1 - t), dtype)
    M1 = jnp.asarray(3.0 * 2.0 ** (prec - 2), dtype) * d1
    A1 = (A + M1) - M1
    r1 = A - A1
    M2 = M1 * jnp.asarray(2.0 ** (-t), dtype)
    A2 = (r1 + M2) - M2
    Ar = r1 - A2
    return A1.astype(slice_dtype), A2.astype(slice_dtype), Ar


def _exact_slice_matmul(A_sl, B_sl, sub):
    """Batched slice-pair product with EXACT accumulation: ``A_sl (m, C)``
    and ``B_sl (C, p)`` are t-bit slices; contraction runs in ``sub``-wide
    blocks whose f32/f64 MXU accumulation is exact (products are integer
    multiples of a common scale, partial sums bounded by 2^(2t + log2 sub)
    < 2^precision), then the per-block partials combine exactly via a
    TwoSum cascade. Returns a ``(hi, lo)`` pair."""
    m, C = A_sl.shape
    p = B_sl.shape[1]
    nsub = C // sub
    acc_dtype = jnp.float64 if A_sl.dtype == jnp.float64 else jnp.float32
    Ab = A_sl.reshape(m, nsub, sub).transpose(1, 0, 2)
    Bb = B_sl.reshape(nsub, sub, p)
    parts = jnp.einsum(
        "nms,nsp->nmp",
        Ab,
        Bb,
        precision=lax.Precision.DEFAULT,
        preferred_element_type=acc_dtype,
    )

    def body(carry, part):
        hi, lo = carry
        hi, err = two_sum(hi, part)
        return (hi, lo + err), None

    zero = jnp.zeros((m, p), acc_dtype)
    (hi, lo), _ = lax.scan(body, (zero, zero), parts)
    return hi, lo




@config.pin_matmul_precision
def compensated_matmul(A, B, *, sub=512, fold=True, A_lo=None):
    """``A @ B`` for f32 (or f64) operands with ~1e-10 (resp. ~1e-19)
    relative application error — the two-float Ozaki-split product of the
    module docstring.

    Args:
        A: ``(m, C)`` left operand (a Gram tile, a preconditioner basis,
            ...).
        B: ``(C, p)`` right-hand sides.
        sub: contraction sub-block width for the exact-accumulation
            slice products. Must keep ``2^(2t) * sub < 2^precision``:
            <= 1024 for f32 8-bit slices (512 default leaves a 2x
            safety margin), <= 2^20 for f64.
        fold: return the folded ``hi + lo`` array (default); ``False``
            returns the raw ``(hi, lo)`` double-float pair (callers
            chaining further compensated arithmetic).
        A_lo: optional low word of a double-float left operand
            ``A + A_lo`` (e.g. a :func:`df32_pairwise` tile). Its
            contribution is ~eps-relative, so it rides the ordinary-
            precision tail GEMM.

    Cost: four bf16 MXU passes (the slice pairs) + two ordinary
    3-pass-f32 GEMMs (the tails). In the kernel-matvec pipeline the GEMM
    passes are minor — the double-float TILE construction upstream is
    VPU-bound and dominates (measured end-to-end ~56x a plain matvec at
    the 262k north star; BENCH_r05 `compensated_matvec_cost_ratio`).
    """
    A = jnp.asarray(A)
    B = jnp.asarray(B)
    m, C = A.shape
    p = B.shape[1]
    C_pad = -(-C // sub) * sub
    if C_pad != C:
        A = jnp.zeros((m, C_pad), A.dtype).at[:, :C].set(A)
        B = jnp.zeros((C_pad, p), B.dtype).at[:C].set(B)
    A1, A2, Ar = split_two_slices(A, axis=1)
    B1, B2, Br = split_two_slices(B, axis=0)

    hi = jnp.zeros((m, p), A.dtype)
    lo = jnp.zeros((m, p), A.dtype)
    for A_sl in (A1, A2):
        for B_sl in (B1, B2):
            h, l = _exact_slice_matmul(A_sl, B_sl, sub)
            hi, lo = _df_add(hi, lo, h, l)
    # O(2^-2t)-relative tails: ordinary precision suffices (their own
    # rounding lands at ~2^-2t * eps relative to the full product).
    A_hi = A1.astype(A.dtype) + A2.astype(A.dtype)  # Exact: <= 2t bits.
    rest = jnp.matmul(
        Ar, B, precision=lax.Precision.HIGH, preferred_element_type=A.dtype
    ) + jnp.matmul(
        A_hi, Br, precision=lax.Precision.HIGH, preferred_element_type=A.dtype
    )
    if A_lo is not None:
        A_lo = jnp.asarray(A_lo)
        if C_pad != C:
            A_lo = jnp.zeros((m, C_pad), A_lo.dtype).at[:, :C].set(A_lo)
        rest = rest + jnp.matmul(
            A_lo, B, precision=lax.Precision.HIGH,
            preferred_element_type=A.dtype,
        )
    hi, lo = _df_add(hi, lo, rest)
    if fold:
        return hi + lo
    return hi, lo


# ---------------------------------------------------------------------------
# Double-float Gram-tile construction for the stationary kernel family.
#
# Even with cancellation-free distances and an exact GEMM, f32 tile entries
# still carry ``|u| * eps * K`` error from REPRESENTING the exp argument
# ``u = -d2 / 2`` in f32 (|u| reaches ~35 before K underflows — ~2e-6
# relative entry error, structured). At kappa(P) ~ 4e6 that operator
# perturbation floors the true residual at ~3e-4 (measured CPU repro) no
# matter how exact the arithmetic around it is. Carrying the distance and
# the exp argument as a double-float pair and writing the tile as
# ``K = (hi, lo)`` with ``hi = exp(u_hi)``, ``lo = hi * u_lo`` pins entry
# error back to ~eps * K. Implemented for the stationary compositions the
# library's serving paths actually meet — EQ / Matern-1/2,3/2,5/2 / RQ under
# (shared) stretch, shift, scaling, sums and products — with a host-side
# ``None`` fallback for anything else (the caller then builds a plain
# accurate-distance tile).
# ---------------------------------------------------------------------------


def _df_norm(h, l):
    return two_sum(h, l)


def _df_add(h1, l1, h2, l2=None):
    """Double-float add: ``(h1, l1) + (h2[, l2])``, renormalized."""
    h, e = two_sum(h1, h2)
    lo = e + l1 if l2 is None else e + l1 + l2
    return _df_norm(h, lo)


def _df_mul(h1, l1, h2, l2):
    p, e = two_prod(h1, h2)
    return _df_norm(p, e + h1 * l2 + l1 * h2)


def _df_scale(s, h, l):
    p, e = two_prod(jnp.asarray(s, h.dtype), h)
    return _df_norm(p, e + jnp.asarray(s, h.dtype) * l)


# exp must be double-float too: a faithful f32 exp's rounding is a SMOOTH
# DETERMINISTIC function of the argument — structured ~eps * K operator
# error that kappa-cancelling solution vectors see coherently (measured:
# the tile-entry term was 1000x the GEMM term, and a 4x entry-error
# improvement bought 400x on ||E sol||). Scheme (cost-tuned r5: a full
# 12-term double-float Horner was ~500 VPU flops/entry and made the TPU
# matvec 42x the plain one):
#   - Cody-Waite: u = k ln2 + r, |r| <= 0.347, reduced against a split
#     ln2 (k * LN2_HI exact; the big subtraction exact by Sterbenz);
#   - exp(r) = 1 + r + r^2/2 + r^3/6 + r^4 * R(r): the leading terms are
#     carried in double-float (their evaluation rounding would otherwise
#     be a SMOOTH function of r — measured: a plain-f32 tail entering at
#     the r^2 scale cost 19x on ||E sol|| despite an identical max entry
#     error); the remainder polynomial R is plain f32, entering at the
#     r^4 * R <= 6e-4 scale where eps-rounding is ~7e-11 absolute;
#   - exact power-of-two scale via ldexp (jnp.exp2 is a transcendental
#     approximation whose eps*|k| error would re-introduce the very
#     |u|*eps floor this removes — measured 1e-6 at u=-18).
# Net coherent entry error ~1e-10 relative at ~150 VPU flops/entry (the
# full double-float Horner it replaces was ~500).
_LN2_HI = 0.693359375  # 10 significand bits: k * LN2_HI exact for |k| < 2^14.
_LN2_LO = -2.121944400546905827679e-4
# R(r) = sum_{j>=0} r^j / (j+4)!  (the r^4 remainder); j<=5 -> truncation
# r^10/10! ~ 7e-12 at |r| = 0.347.
_EXP_R_COEFS = [1.0 / _math.factorial(j + 4) for j in range(6)]
_C3_H = float(np.float32(1.0 / 6.0))
_C3_L = 1.0 / 6.0 - _C3_H


def _df_exp(h, l):
    dtype = h.dtype
    k = jnp.round(h * jnp.asarray(1.0 / (_LN2_HI + _LN2_LO), dtype))
    rh = h - k * jnp.asarray(_LN2_HI, dtype)  # Exact (Sterbenz).
    ph, pe = two_prod(k, jnp.asarray(_LN2_LO, dtype))
    rh, rl = _df_add(rh, l, -ph, -pe)
    # Remainder polynomial in plain f32 (enters at the r^4 scale).
    R = jnp.full_like(rh, _EXP_R_COEFS[-1])
    for c in reversed(_EXP_R_COEFS[:-1]):
        R = R * rh + jnp.asarray(c, dtype)
    # r^2 and r^3 as double-floats.
    r2h, r2e = two_prod(rh, rh)
    r2e = r2e + 2.0 * rh * rl
    r3h, r3e = two_prod(r2h, rh)
    r3e = r3e + r2e * rh + r2h * rl
    q4 = (r2h * r2h) * R  # r^4 R: plain (eps here is ~7e-11 absolute).
    # Terms: r^2/2 (exact scale) and r^3 * (1/6 as a split constant).
    t2h, t2e = 0.5 * r2h, 0.5 * r2e
    t3h, t3p = two_prod(r3h, jnp.asarray(_C3_H, dtype))
    t3e = t3p + r3h * jnp.asarray(_C3_L, dtype) + r3e * jnp.asarray(
        _C3_H, dtype
    )
    # ((1 (+) r) (+) r^2/2) (+) r^3/6, low words summed once.
    s1h, s1e = two_sum(_opaque(1.0, dtype), rh)  # Opaque 1: fold hazard.
    s2h, s2e = two_sum(s1h, t2h)
    s3h, s3e = two_sum(s2h, t3h)
    el = s1e + s2e + s3e + rl + t2e + t3e + q4
    eh, er = two_sum(s3h, el)
    ki = k.astype(jnp.int32)
    return jnp.ldexp(eh, ki), jnp.ldexp(er, ki)


def _df_sqrt(h, l):
    s = jnp.sqrt(h)
    p, pe = two_prod(s, s)
    denom = jnp.where(s > 0, 2.0 * s, 1.0)
    s_lo = jnp.where(s > 0, ((h - p) - pe + l) / denom, 0.0)
    return s, s_lo


def _df_log(h, l):
    # log(h + l): f32 log plus a one-step Newton correction (captures
    # log's own rounding to ~eps^2 at the cost of one exp).
    L = jnp.log(h)
    corr = (h * jnp.exp(-L) - 1.0) + l / h
    return L, corr


def _df32_dists2(x, y, inv_scale):
    """Double-float pairwise squared distances ``(m, n)`` with the
    per-dimension factor ``inv_scale`` applied to the DIFFERENCES (scaling
    inputs first would re-introduce the near-diagonal cancellation)."""
    d = x.shape[-1]
    hi = None
    for di in range(d):
        a = x[:, None, di]
        b = y[None, :, di]
        dd, dd_e = two_sum(a, -b)  # Exact difference pair.
        if inv_scale is not None:
            s = inv_scale[di] if jnp.ndim(inv_scale) > 0 else inv_scale
            p, pe = two_prod(dd, s)
            dd, dd_e = p, pe + dd_e * s
        sq, sq_e = two_prod(dd, dd)
        sq_e = sq_e + 2.0 * dd * dd_e
        if hi is None:
            hi, lo = sq, sq_e
        else:
            hi, lo = _df_add(hi, lo, sq, sq_e)
    return hi, lo


def _df32_pw(k, x, y, inv_scale):
    """Recursive df32 pairwise evaluation; returns ``(hi, lo)`` or None
    (no rule — caller falls back). ``inv_scale`` accumulates shared
    stretches down to the distance computation."""
    from ..kernels import kernel as K

    if isinstance(k, K.EQ):
        d2h, d2l = _df32_dists2(x, y, inv_scale)
        return _df_exp(-0.5 * d2h, -0.5 * d2l)
    if isinstance(k, K.Matern12):
        rh, rl = _df_sqrt(*_df32_dists2(x, y, inv_scale))
        return _df_exp(-rh, -rl)
    if isinstance(k, K.Matern32):
        rh, rl = _df_sqrt(*_df32_dists2(x, y, inv_scale))
        rh, rl = _df_scale(3.0**0.5, rh, rl)
        eh, el = _df_exp(-rh, -rl)
        th, tl = _df_add(_opaque(1.0, rh.dtype), jnp.zeros((), rh.dtype), rh, rl)
        return _df_mul(th, tl, eh, el)
    if isinstance(k, K.Matern52):
        rh, rl = _df_sqrt(*_df32_dists2(x, y, inv_scale))
        rh, rl = _df_scale(5.0**0.5, rh, rl)
        r2h, r2l = _df_mul(rh, rl, rh, rl)
        ph, pl = _df_add(_opaque(1.0, rh.dtype), jnp.zeros((), rh.dtype), rh, rl)
        ph, pl = _df_add(ph, pl, r2h / 3.0, r2l / 3.0)
        eh, el = _df_exp(-rh, -rl)
        return _df_mul(ph, pl, eh, el)
    if isinstance(k, K.RQ):
        alpha = jnp.asarray(k.alpha, x.dtype)
        d2h, d2l = _df32_dists2(x, y, inv_scale)
        th, tl = _df_add(
            _opaque(1.0, d2h.dtype), jnp.zeros((), d2h.dtype),
            d2h / (2.0 * alpha), d2l / (2.0 * alpha),
        )
        Lh, Ll = _df_log(th, tl)
        return _df_exp(-alpha * Lh, -alpha * Ll)
    if isinstance(k, K.ScaledKernel):
        sub = _df32_pw(k.k, x, y, inv_scale)
        if sub is None:
            return None
        return _df_scale(k.scale, *sub)
    if isinstance(k, K.SumKernel):
        s1 = _df32_pw(k.k1, x, y, inv_scale)
        s2 = _df32_pw(k.k2, x, y, inv_scale)
        if s1 is None or s2 is None:
            return None
        return _df_add(*s1, *s2)
    if isinstance(k, K.ProductKernel):
        s1 = _df32_pw(k.k1, x, y, inv_scale)
        s2 = _df32_pw(k.k2, x, y, inv_scale)
        if s1 is None or s2 is None:
            return None
        return _df_mul(*s1, *s2)
    if isinstance(k, K.StretchedKernel):
        if k.s1 is not k.s2:
            return None
        s = jnp.asarray(k.s1, x.dtype)
        inv = 1.0 / s  # eps-level PARAMETER perturbation: harmless.
        if jnp.ndim(inv) > 1:
            return None
        new_scale = inv if inv_scale is None else inv_scale * inv
        return _df32_pw(k.k, x, y, new_scale)
    if isinstance(k, K.ShiftedKernel):
        # A shared shift cancels in the differences of a stationary child.
        if k.s1 is not k.s2 or not k.k.stationary:
            return None
        return _df32_pw(k.k, x, y, inv_scale)
    if isinstance(k, K.ZeroKernel):
        z = jnp.zeros((x.shape[0], y.shape[0]), x.dtype)
        return z, z
    if isinstance(k, K.OneKernel):
        o = jnp.broadcast_to(_opaque(1.0, x.dtype), (x.shape[0], y.shape[0]))
        return o, jnp.zeros_like(o)
    return None


def df32_pairwise(k, x, y):
    """Double-float Gram tile ``(hi, lo)`` for a stationary kernel
    expression (entry error ~eps * K), or ``None`` when the expression has
    no df32 rule — decided host-side at trace time, so callers can fall
    back to the plain accurate-distance build."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    if x.ndim == 1:
        x = x[:, None]
    if y.ndim == 1:
        y = y[:, None]
    return _df32_pw(k, x, y, None)


@config.pin_matmul_precision
def compensated_scaled_apply(U, coeff, base, v):
    """Two-float evaluation of ``base * v + U @ (coeff * (U^T @ v))`` —
    the eig-preconditioner application (``pchol.eig_preconditioner_ops``)
    with its catastrophic cancellation compensated.

    At small noise the plain-f32 application loses ~sqrt(kappa(P))
    digits: for ``apply_half_inv`` both ``v / sqrt(noise)`` and the
    correction are ~``||v|| / sqrt(noise)`` while their sum (for v in the
    top eigenspace) is ``||v|| / sqrt(lam + noise)`` — a cancellation of
    ``sqrt((lam+noise)/noise)`` that turned the r5 compensated-Gram CG's
    true-residual floor into ~1e-3 (measured n=16,384 CPU repro) even
    with an exact Gram matvec. Here both GEMMs run through
    :func:`compensated_matmul` and the base/correction sum stays in
    double-float until one final fold, leaving ~eps relative error on
    the OUTPUT magnitude."""
    squeeze = v.ndim == 1
    v2 = v[:, None] if squeeze else v
    Uv_hi, Uv_lo = compensated_matmul(U.T, v2, fold=False)
    p_hi, p_err = two_prod(coeff[:, None], Uv_hi)
    p_lo = coeff[:, None] * Uv_lo + p_err
    c_hi, c_lo = compensated_matmul(U, p_hi, fold=False)
    c_lo = c_lo + jnp.matmul(
        U, p_lo, precision=lax.Precision.HIGH, preferred_element_type=v2.dtype
    )
    b_hi, b_err = two_prod(jnp.asarray(base, v2.dtype), v2)
    out_hi, e = two_sum(c_hi, b_hi)
    out = out_hi + (c_lo + e + b_err)
    return out[:, 0] if squeeze else out
