"""Partial pivoted-Cholesky preconditioner for kernel systems.

A rank-``k`` pivoted Cholesky of the kernel matrix (greedy trace-error
pivoting) gives ``K ~ L L^T``; the preconditioner ``P = noise I + L L^T`` is
applied through the Woodbury identity, cutting CG iteration counts for
smooth kernels dramatically (the GPyTorch recipe)."""

import jax
import jax.numpy as jnp
from jax import lax

from ..kernels import elwise, pairwise
from ..matrix import dense
from .cg import batched_cg
from .. import config

__all__ = [
    "pivoted_cholesky",
    "woodbury_preconditioner",
    "eig_preconditioner_factors",
    "eig_preconditioner_ops",
    "make_whitened_solver",
]


@config.pin_matmul_precision
def pivoted_cholesky(k, x, rank):
    """Rank-``rank`` pivoted Cholesky of ``k(x, x)`` — returns ``L (n, rank)``.

    Matrix-free: each step evaluates one kernel row."""
    x = jnp.asarray(x)
    if x.ndim == 1:
        x = x[:, None]
    n = x.shape[0]
    d = elwise(k, x)[:, 0]  # Residual diagonal.
    L = jnp.zeros((n, rank), x.dtype)
    # Early-stopping tolerance: once the largest residual-diagonal entry
    # falls to the round-off floor of the largest initial diagonal entry,
    # the matrix is numerically exhausted — dividing the (noise-level)
    # residual row by sqrt(pivot) would amplify round-off into enormous
    # spurious columns (smooth kernels like EQ reach this floor well before
    # rank 50 in f64). Size-independent on purpose: scaling with the trace
    # would stop at O(N * eps) and cripple the preconditioner at large N in
    # f32. Dead steps write zero columns, which downstream Woodbury/sqrt
    # ops treat as an identity block.
    tol = 100 * jnp.finfo(x.dtype).eps * jnp.maximum(jnp.max(d), 1e-30)

    def body(i, carry):
        d, L = carry
        piv = jnp.argmax(d).astype(jnp.int32)
        live = d[piv] > tol
        x_piv = lax.dynamic_slice(x, (piv, jnp.int32(0)), (1, x.shape[1]))
        row = jnp.asarray(dense(pairwise(k, x, x_piv)))[:, 0]
        row = row - L @ L[piv]
        pivot_val = jnp.sqrt(jnp.maximum(d[piv], 1e-30))
        l_i = jnp.where(live, row / pivot_val, 0.0)
        L = L.at[:, i].set(l_i)
        d = jnp.maximum(d - l_i**2, 0.0)
        d = d.at[piv].set(jnp.where(live, 0.0, d[piv]))
        return d, L

    _, L = lax.fori_loop(0, rank, body, (d, L))
    return L


@config.pin_matmul_precision
def preconditioner_sqrt_ops(L, noise):
    """For ``P = noise I + L L^T``: returns ``(apply_P_half_inv,
    apply_P_half, logdet_P)``.

    ``P^{-1/2}`` whitens operators for variance-reduced quadrature
    (``logdet K = logdet P + tr log(P^{-1/2} K P^{-1/2})``, near-identity
    when ``P ~ K``); ``P^{1/2}`` draws probes ``z = P^{1/2} u ~ N(0, P)``
    so the mBCG quadrature of a *preconditioned* CG solve is unbiased
    (``slq.py:cg_quadrature_logdet``)."""
    noise = jnp.asarray(noise)
    n, k = L.shape
    U, S, _ = jnp.linalg.svd(L, full_matrices=False)
    lam = noise + S**2

    sqrt_noise = jnp.sqrt(noise)
    inv_sqrt_noise = 1.0 / sqrt_noise
    coeff_inv = 1.0 / jnp.sqrt(lam) - inv_sqrt_noise
    coeff_fwd = jnp.sqrt(lam) - sqrt_noise

    def _apply(v, base, coeff):
        squeeze = v.ndim == 1
        v2 = v[:, None] if squeeze else v
        Uv = U.T @ v2
        out = v2 * base + U @ (coeff[:, None] * Uv)
        return out[:, 0] if squeeze else out

    def apply_half_inv(v):
        return _apply(v, inv_sqrt_noise, coeff_inv)

    def apply_half(v):
        return _apply(v, sqrt_noise, coeff_fwd)

    logdet_p = jnp.sum(jnp.log(lam)) + (n - k) * jnp.log(noise)
    return apply_half_inv, apply_half, logdet_p


@config.pin_matmul_precision
def eig_preconditioner_factors(matvec, om, power_iters=1):
    """Approximate top eigenpairs ``(U, lam)`` of the SPD operator behind
    ``matvec`` by randomized subspace iteration (Halko–Martinsson–Tropp
    2011) started from the probe block ``om`` (n, rank).

    This is the f32-at-scale replacement for :func:`pivoted_cholesky` as a
    preconditioner factory (measured on the N=262,144 north-star step,
    TPU v5e): the greedy pivoted Cholesky divides near-floor residual rows
    by pivots as small as its stopping tolerance, which in float32 at this
    scale amplifies accumulated round-off into junk columns, and applying
    its Woodbury inverse needs a core solve with condition ~lambda_max /
    noise (~6.5e5 here, ~8% relative error per application in f32) — the
    preconditioned CG *stalls* (rel residual 3.7 after 200 iterations).
    Subspace iteration is GEMM-shaped (MXU-friendly: every step is a
    blocked-Gram sweep against ``rank`` right-hand sides), its QR keeps the
    basis orthonormal to f32 round-off, and the resulting preconditioner is
    applied through a *diagonal* eigenbasis — no ill-conditioned solve
    anywhere.

    Each power iteration costs one Gram-tile sweep; ``power_iters=1``
    (two sweeps total, incl. the Rayleigh–Ritz product) is ample for the
    fast-decaying spectra of smooth kernels.
    """
    Q, _ = jnp.linalg.qr(matvec(om))
    for _ in range(power_iters - 1):
        Q, _ = jnp.linalg.qr(matvec(Q))
    KQ = matvec(Q)
    T = Q.T @ KQ
    T = 0.5 * (T + T.T)
    lam, V = jnp.linalg.eigh(T)
    return Q @ V, jnp.maximum(lam, 0.0)


@config.pin_matmul_precision
def eig_preconditioner_ops(U, lam, noise, n, *, compensated=False):
    """Preconditioner ops for ``P = noise I + U diag(lam) U^T`` with
    orthonormal ``U`` (n, r): returns ``(apply_P_inv, apply_P_half,
    apply_P_half_inv, logdet_P)``.

    ``compensated=True`` routes every application through the two-float
    :func:`~stheno_tpu.iterative.compensated.compensated_scaled_apply`:
    at small noise the plain ``apply_half_inv`` cancels
    ``sqrt((lam+noise)/noise)`` digits between its base and correction
    terms, which caps the whitened CG's TRUE-residual floor at ~1e-3
    regardless of the Gram matvec's accuracy (measured r5 repro) — the
    compensated form restores an ~eps floor at ~6x the (n, r) GEMM
    cost.

    All of them are exact in the eigenbasis: ``P``'s spectrum is
    ``lam + noise`` on ``span(U)`` and ``noise`` on its complement, so the
    inverse and square roots are elementwise on ``lam`` — each application
    is two (n, r) GEMMs and stays numerically symmetric to round-off.
    ``apply_P_half_inv`` is what makes *split*-preconditioned CG viable at
    f32 scale (see ``nlml.py``): the whitened operator
    ``P^{-1/2} A P^{-1/2}`` has O(1) condition number, so CG's attainable
    residual floor — ``eps_matvec * kappa`` of the operator it actually
    recurses on — drops from ~1e-2 (A itself, kappa ~ lambda_max/noise)
    to ~1e-7."""
    noise = jnp.asarray(noise)
    d = lam + noise
    r = lam.shape[0]
    inv_coeff = lam / (noise * d)
    sqrt_noise = jnp.sqrt(noise)
    half_coeff = jnp.sqrt(d) - sqrt_noise
    half_inv_coeff = 1.0 / jnp.sqrt(d) - 1.0 / sqrt_noise

    if compensated:
        from .compensated import compensated_scaled_apply

        def _apply(v, base, coeff):
            return compensated_scaled_apply(U, coeff, base, v)

    else:

        def _apply(v, base, coeff):
            squeeze = v.ndim == 1
            v2 = v[:, None] if squeeze else v
            Uv = U.T @ v2
            out = v2 * base + U @ (coeff[:, None] * Uv)
            return out[:, 0] if squeeze else out

    def apply_inv(v):
        return _apply(v, 1.0 / noise, -inv_coeff)

    def apply_half(v):
        return _apply(v, sqrt_noise, half_coeff)

    def apply_half_inv(v):
        return _apply(v, 1.0 / sqrt_noise, half_inv_coeff)

    logdet_p = jnp.sum(jnp.log(d)) + (n - r) * jnp.log(noise)
    return apply_inv, apply_half, apply_half_inv, logdet_p


@config.pin_matmul_precision
def woodbury_preconditioner(L, noise):
    """``P^{-1}`` for ``P = noise I + L L^T`` via the Woodbury identity."""
    noise = jnp.asarray(noise)
    rank = L.shape[1]
    core = jnp.eye(rank, dtype=L.dtype) + (L.T @ L) / noise
    core_chol = jnp.linalg.cholesky(core)

    def apply(r):
        squeeze = r.ndim == 1
        r2 = r[:, None] if squeeze else r
        rhs = L.T @ r2 / noise
        sol = jax.scipy.linalg.cho_solve((core_chol, True), rhs)
        out = r2 / noise - (L @ sol) / noise
        return out[:, 0] if squeeze else out

    return apply


@config.pin_matmul_precision
def make_whitened_solver(
    mv_raw, n, noise, rank, key=None, *, power_iters=1, dtype=None,
    state=None, mv_raw_comp=None, compensated="auto", comp_refine=1,
):
    """Factory for split-preconditioned CG solves of ``(K + noise I) X = B``
    — the f32-at-scale solve path shared by every matrix-free posterior
    (``iterative_posterior_mean/var``, pathwise sampling, the grid paths).

    ``mv_raw`` applies ``K`` only (no noise term). The returned
    ``solve(rhs, tol=..., max_iters=...) -> (X, info)`` closure whitens with
    the subspace-iteration eig preconditioner built here ONCE — the chunked
    posterior-variance path reuses it across all chunks. ``key`` seeds the
    subspace probes; the default fixed key is sound because the
    preconditioner only affects convergence speed, never the solution.
    ``state``: optional prebuilt ``(U, lam)`` (e.g. from
    ``nlml.eig_precond_state``) — skips the subspace-iteration build here
    entirely; ``rank``/``key``/``power_iters`` are then ignored.

    Tolerance semantics: ``tol`` is the relative residual of the WHITENED
    system ``P^{-1/2}(K + noise I)P^{-1/2} X' = P^{-1/2} B`` — the system
    CG actually recurses on. The un-whitened relative residual can be up to
    ~sqrt(kappa(P)) looser (a few hundred at the documented
    lambda_max/noise ~ 6.5e5 conditioning), though in practice the whitened
    path lands orders of magnitude below what un-whitened f32 CG could
    reach at all (its floor sits AT ~1e-2 at this scale). Callers that need
    the un-whitened number pass ``true_residual=True`` to the returned
    ``solve`` and read ``info["rel_residual_true"]`` (costs one extra
    matvec).

    ``mv_raw_comp`` / ``compensated``: the small-noise escape hatch (r5).
    ``mv_raw_comp`` applies ``K`` through the two-float compensated
    matvec (``iterative/compensated.py``); ``compensated="auto"``
    (default) switches the CG matvecs onto it when ``noise`` falls below
    half the measured plain-f32 validity wall
    ``||K|| * eps * sqrt(n)`` (resolved host-side from the state's top
    Ritz value; under a trace the decision is undecidable and stays on
    the plain path — pass ``True`` explicitly there). The preconditioner
    build itself always runs the plain matvec: its errors only perturb
    Ritz values relatively (~1e-3), which costs CG iterations, never
    correctness.

    ``comp_refine``: iterative-refinement passes appended to compensated
    solves (default 1). The whitened CG's *recursive* residual drifts
    from the true one through the f32 CG-vector arithmetic (inexact
    Krylov), leaving a true-residual floor ~3e-4 at kappa(P) ~ 4e6 even
    with exact operator applications (measured CPU repro); one restart —
    true residual recomputed through the compensated matvec, then a
    correction solve — multiplies the error by the solve's own
    contraction, landing ~1e-6..1e-7. Costs one extra (shorter) CG
    solve; ignored on the plain path.

    Requires scalar ``noise`` (the eigenbasis ops assume ``P = noise I +
    U diag(lam) U^T``)."""
    if jnp.ndim(noise) != 0:
        raise ValueError(
            "make_whitened_solver requires scalar noise; use an "
            "unpreconditioned CG solve (precond_rank=0) for per-point "
            "noise."
        )
    if dtype is None:
        dtype = jnp.asarray(noise).dtype
    if state is not None:
        U, lam = state
    else:
        if key is None:
            key = jax.random.PRNGKey(0)
        om = jax.random.normal(key, (n, min(rank, n)), dtype)
        U, lam = eig_preconditioner_factors(mv_raw, om, power_iters)
    from .compensated import resolve_compensated

    use_comp = resolve_compensated(
        compensated, noise, lam, n, dtype, mv_raw_comp is not None
    )
    mv_use = mv_raw_comp if use_comp else mv_raw
    _, _, phi, _ = eig_preconditioner_ops(
        U, lam, noise, n, compensated=use_comp
    )
    noise_arr = jnp.asarray(noise)

    def solve(rhs, *, tol=1e-6, max_iters=1000, true_residual=False,
              segment_iters=6, **cg_kwargs):
        def mv_white(v):
            pv = phi(v)
            return phi(mv_use(pv) + noise_arr * pv)

        def mv_full(v):
            return mv_use(v) + noise_arr * v

        rhs = jnp.asarray(rhs)
        # Segmented host-driven CG for EAGER compensated solves: a
        # compensated matvec costs ~12 s at the 262k north star, so a
        # whole CG inside one lax.while_loop runs many minutes in a
        # single device program — measured to fault the remote v5e
        # ("UNAVAILABLE: TPU device error") at ~10+ minutes. Splitting
        # into warm-started ``segment_iters``-iteration programs bounds
        # each dispatch at ~1 minute; the ONE compiled segment program is
        # reused (same shapes), the restarts cost a few extra CG
        # iterations at most under the strong whitened preconditioner.
        # Only possible when the rhs is concrete (serving builds); under
        # an outer jit the single-program path runs — keep its iteration
        # budget modest there.
        segmented = (
            use_comp
            and segment_iters
            and not cg_kwargs.get("track_tridiag")
            and not isinstance(rhs, jax.core.Tracer)
        )

        # One jitted segment program, reused across restarts: repeat
        # dispatches hit the in-memory pjit cache (an eager while_loop
        # primitive re-reads its persistent-cache entry per call, which
        # reproducibly aborts on this jax build), and re-tracing per
        # segment is avoided. The (n, r) eigenbasis is a jit ARGUMENT:
        # closed over, it is serialised into the remote compile request —
        # HTTP 413 at rank 256 (268 MB), the axon limit CLAUDE.md
        # documents.
        def _seg_body(b, x0, U_, lam_):
            _, _, phi_, _ = eig_preconditioner_ops(
                U_, lam_, noise_arr, n, compensated=use_comp
            )

            def mvw(v):
                pv = phi_(v)
                return phi_(mv_use(pv) + noise_arr * pv)

            return batched_cg(
                mvw, b, tol=tol, max_iters=segment_iters, x0=x0
            )

        seg_jit = jax.jit(_seg_body)
        seg_solve = lambda b, x0: seg_jit(b, x0, U, lam)

        def cg(b_white, budget, x0=None):
            if not segmented:
                return batched_cg(
                    mv_white, b_white, tol=tol, max_iters=budget,
                    x0=x0, **cg_kwargs,
                )
            x = jnp.zeros_like(b_white) if x0 is None else x0
            done = 0
            while True:
                x, info = seg_solve(b_white, x)
                it = int(info["iters"])
                done += it
                if (
                    float(info["rel_residual"]) <= tol
                    or it == 0
                    or done >= budget
                ):
                    return x, dict(info, iters=jnp.asarray(done))

        sol, info = cg(phi(rhs), max_iters)
        sol = phi(sol)
        if use_comp:
            # Iterative refinement: the compensated matvec makes the TRUE
            # residual computable to ~eps * ||rhs||, so each restart
            # contracts the solution error by the solve's own accuracy.
            for _ in range(comp_refine):
                resid = rhs - mv_full(sol)
                dw, info_r = cg(phi(resid), max_iters)
                sol = sol + phi(dw)
                merged = dict(info)
                merged["iters"] = info["iters"] + info_r["iters"]
                merged["rel_residual"] = info_r["rel_residual"]
                info = merged
        if true_residual:
            r = rhs - mv_full(sol)
            info["rel_residual_true"] = jnp.max(
                jnp.linalg.norm(jnp.atleast_2d(r.T).T, axis=0)
                / jnp.maximum(
                    jnp.linalg.norm(jnp.atleast_2d(rhs.T).T, axis=0), 1e-30
                )
            )
        return sol, info

    # Pinned so a direct (library-external) caller in an unpinned context
    # still gets exact-f32 whitening GEMMs (CLAUDE.md: every matmul-bearing
    # public entry point).
    solve = config.pin_matmul_precision(solve)
    solve.compensated = use_comp  # Introspection: which matvec CG runs on.
    return solve
