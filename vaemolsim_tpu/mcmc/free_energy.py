"""Free-energy estimation: EXP (Zwanzig), BAR (Bennett), and annealed
importance sampling (AIS) — the quantities molecular-simulation MC is
ultimately run for.

Beyond-reference capability (the reference stops at sampling; its MC
engine is vaemolsim/mcmc.py): with a trained flow/VAE as the learned
map these implement targeted free-energy perturbation (Wirnsberger et
al. 2020) and annealed log-Z estimation as single compiled programs —
scanned ladders, vmapped chains, exact log-space arithmetic, reusing
the production local-move trial kernel (mcmc.moves._scaled_trial).

Conventions — REDUCED log-density units, matching the engine
(mcmc.engine: ``energy_func`` = LOG target density; reference sign
convention vaemolsim/mcmc.py:116).  For unnormalized log densities
``log p~_a = log p_a + ln Z_a``:

- dimensionless free-energy difference  ``dF(a->b) = -ln(Z_b / Z_a)``
- work values for the a->b perturbation, evaluated at samples x ~ p_a:
  ``w = log p~_a(x) - log p~_b(x)``  (:func:`work_values`)

so EXP reads ``dF = -ln < exp(-w) >_a`` and AIS's ``log_z`` estimates
``ln(Z_target / Z_init)`` (== ``-dF(init->target)``).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import logsumexp

from vaemolsim_tpu.mcmc.moves import _scaled_trial

Array = jax.Array

__all__ = ["work_values", "exp_free_energy", "bar_free_energy", "ais",
           "AISResult", "MBARResult", "mbar_free_energy",
           "mbar_from_samples", "mbar_perturbed_free_energy",
           "mbar_expectation", "ti_free_energy",
           "gauss_legendre_lambdas", "targeted_work_values",
           "targeted_bar", "tfep_loss"]


def work_values(log_prob_from: Callable[[Array], Array],
                log_prob_to: Callable[[Array], Array],
                samples: Array) -> Array:
    """Reduced work ``w = log p~_from(x) - log p~_to(x)`` at ``samples``
    (drawn from the *from* state) for the from->to perturbation."""
    return log_prob_from(samples) - log_prob_to(samples)


def _log_mean_exp(a: Array) -> Array:
    return logsumexp(a) - jnp.log(a.shape[0])


def exp_free_energy(work: Array) -> Tuple[Array, Array]:
    """Zwanzig exponential-averaging (FEP) estimate.

    ``dF = -ln < exp(-w) >`` over the 1-D array of work values, with the
    delta-method standard error ``sqrt(var(exp(-w)) / (n <exp(-w)>^2))``
    computed in log space (no overflow for large |w|).

    Returns ``(delta_f, stderr)``.  One-sided: accurate only when the
    forward distribution overlaps the target; prefer :func:`bar_free_energy`
    when samples from both states exist.
    """
    work = jnp.ravel(work)
    n = work.shape[0]
    log_mean = _log_mean_exp(-work)                      # ln<e^-w>
    log_mean_sq = _log_mean_exp(-2.0 * work)             # ln<e^-2w>
    delta_f = -log_mean
    # var(e^-w)/n<e^-w>^2 = (e^{ln<e^-2w> - 2 ln<e^-w>} - 1)/n
    ratio = jnp.exp(jnp.minimum(log_mean_sq - 2.0 * log_mean, 60.0))
    stderr = jnp.sqrt(jnp.maximum(ratio - 1.0, 0.0) / n)
    return delta_f, stderr


def bar_free_energy(work_forward: Array, work_reverse: Array,
                    iters: int = 100) -> Tuple[Array, Array]:
    """Bennett acceptance ratio estimate from bidirectional work.

    ``work_forward``: w = log p~_0 - log p~_1 at samples x ~ p_0;
    ``work_reverse``: w = log p~_1 - log p~_0 at samples x ~ p_1.
    Solves the self-consistent BAR equation

        sum_i sigmoid(-(M + w_F_i - dF)) = sum_j sigmoid(-(-M + w_R_j + dF)),
        M = ln(n_F / n_R)

    by bisection (the residual is monotone in dF — ``iters`` halvings of
    a bracket seeded by the two one-sided EXP estimates give full float32
    precision as one fixed-shape ``fori_loop``, jit/vmap-safe).  Returns
    ``(delta_f, stderr)`` with Bennett's asymptotic standard error.
    """
    w_f = jnp.ravel(work_forward)
    w_r = jnp.ravel(work_reverse)
    n_f, n_r = w_f.shape[0], w_r.shape[0]
    M = jnp.log(jnp.asarray(n_f / n_r, w_f.dtype))

    def residual(df):
        # log-space sums of Fermi functions: monotone increasing in df.
        lhs = logsumexp(-jnp.logaddexp(0.0, M + w_f - df))
        rhs = logsumexp(-jnp.logaddexp(0.0, -M + w_r + df))
        return lhs - rhs

    # Bracket from the two one-sided EXP estimates (dF truth lies between
    # them in expectation; pad generously — bisection cost is identical).
    ef, _ = exp_free_energy(w_f)           # forward EXP: dF estimate
    er, _ = exp_free_energy(w_r)           # reverse EXP: -dF estimate
    lo = jnp.minimum(ef, -er) - 50.0
    hi = jnp.maximum(ef, -er) + 50.0

    def body(_, bounds):
        lo, hi = bounds
        mid = 0.5 * (lo + hi)
        go_up = residual(mid) < 0.0
        return (jnp.where(go_up, mid, lo), jnp.where(go_up, hi, mid))

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    delta_f = 0.5 * (lo + hi)

    # Bennett asymptotic variance:  (  <f^2>/<f>^2 - 1 ) / n  per leg,
    # f = sigmoid of the (shifted) work at the solution.
    f_f = jax.nn.sigmoid(-(M + w_f - delta_f))
    f_r = jax.nn.sigmoid(-(-M + w_r + delta_f))

    def leg_var(f, n):
        m1 = jnp.mean(f)
        m2 = jnp.mean(f ** 2)
        return (m2 / jnp.maximum(m1 ** 2, 1e-38) - 1.0) / n

    stderr = jnp.sqrt(jnp.maximum(leg_var(f_f, n_f) + leg_var(f_r, n_r),
                                  0.0))
    return delta_f, stderr


class MBARResult(NamedTuple):
    """Output of :func:`mbar_free_energy`.

    free_energies: (K,) dimensionless free energies, gauge
        ``free_energies[0] == 0`` — entry k is ``dF(0->k)``.
    stderrs: (K,) asymptotic standard errors of ``dF(0->k)`` (entry 0
        is 0 by the gauge).
    theta: (K, K) asymptotic covariance of the free energies; the
        variance of any difference is
        ``theta[i,i] + theta[j,j] - 2 theta[i,j]`` (gauge-invariant).
    log_denominator: (N,) per-sample log MBAR denominator
        ``ln sum_k N_k exp(f_k + log p~_k(x_n))`` in the output gauge —
        everything reweighting needs (perturbed states, expectations).
    counts: (K,) samples drawn from each state.
    log_probs: (K, N) the input log-density matrix (kept for
        reweighting).
    """
    free_energies: Array
    stderrs: Array
    theta: Array
    log_denominator: Array
    counts: Array
    log_probs: Array


def _mbar_theta(weights: Array, counts: Array) -> Array:
    """Asymptotic covariance of MBAR free energies from the (N, K)
    weight matrix ``W_nk = exp(f_k + log p~_k(x_n) - log_denom_n)``
    (columns of sampled states sum to 1 at the solution).

    Shirts & Chodera (2008) appendix D, pymbar's ``svd-ew`` form:
    with ``W^T W = V S^2 V^T`` (eigendecomposition, K x K),

        Theta = V S (I - S V^T diag(N) V S)^+  S V^T.
    """
    a = weights.T @ weights                       # (K, K), the only O(N) op
    lam, v = jnp.linalg.eigh(a)
    s = jnp.sqrt(jnp.maximum(lam, 0.0))
    inner = (jnp.eye(a.shape[0], dtype=a.dtype)
             - s[:, None] * (v.T @ (counts[:, None] * v)) * s[None, :])
    return (v * s[None, :]) @ jnp.linalg.pinv(inner, hermitian=True) \
        @ (s[:, None] * v.T)


def mbar_free_energy(log_probs: Array, counts,
                     *, sc_iters: int = 200,
                     newton_iters: int = 30) -> MBARResult:
    """Multistate Bennett acceptance ratio (MBAR, Shirts & Chodera 2008)
    — the statistically-optimal estimator of all pairwise free-energy
    differences among K states from samples of each.

    ``log_probs``: (K, N) matrix of UNNORMALIZED log densities
    ``log p~_k(x_n)`` of every state k at every pooled sample x_n (the
    N samples are the concatenation of each state's draws, any order);
    ``counts``: (K,) samples contributed by each state (CONCRETE —
    python ints / numpy, not traced; zero-count entries are allowed and
    become perturbation estimates).  Sign convention matches the rest of
    this module (``energy_func`` = log density): for reduced potentials
    ``u_k``, pass ``-u_k``.

    Solves the self-consistent MBAR equations

        f_k = -ln sum_n exp(log p~_k(x_n)) /
                         sum_j N_j exp(f_j + log p~_j(x_n))

    by ``sc_iters`` globally-convergent self-consistent sweeps followed
    by ``newton_iters`` Newton steps on the equivalent convex objective
    (both as fixed-shape ``fori_loop``s over one (K, N) log-space
    kernel — jit-safe, fixed cost).  K=2 reduces exactly to
    :func:`bar_free_energy`'s estimator.  Uncertainties are the
    Shirts-Chodera asymptotic covariance (pymbar parity).
    """
    L = jnp.asarray(log_probs)
    if L.ndim != 2:
        raise ValueError(f"log_probs must be (K, N); got shape {L.shape}")
    counts_np = np.asarray(counts)
    K, N = L.shape
    if counts_np.shape != (K,):
        raise ValueError(f"counts must be ({K},); got {counts_np.shape}")
    if int(counts_np.sum()) != N:
        raise ValueError(f"counts sum to {int(counts_np.sum())} but "
                         f"log_probs has {N} pooled samples")
    sampled = np.flatnonzero(counts_np > 0)
    if sampled.size == 0:
        raise ValueError("at least one state must have samples")

    Ls = L[sampled]                                         # (Ks, N)
    logNs = jnp.log(jnp.asarray(counts_np[sampled], L.dtype))
    Ns = jnp.asarray(counts_np[sampled], L.dtype)

    def log_denom(fs):
        return logsumexp(logNs[:, None] + fs[:, None] + Ls, axis=0)

    def sc_step(_, fs):
        fs = -logsumexp(Ls - log_denom(fs)[None, :], axis=1)
        return fs - fs[0]

    fs = jax.lax.fori_loop(0, sc_iters, sc_step,
                           jnp.zeros(sampled.size, L.dtype))

    if newton_iters and sampled.size > 1:
        # Convex MBAR objective over the gauge-reduced fs[1:]; Newton
        # polishes the self-consistent warm start to quadratic
        # convergence.  Steps are norm-clipped as a trust region (near
        # the solution they are tiny, so the clip never binds there).
        def objective(f_free):
            full = jnp.concatenate([jnp.zeros((1,), L.dtype), f_free])
            return jnp.sum(log_denom(full)) - jnp.dot(Ns, full)

        def newton_step(_, f_free):
            g = jax.grad(objective)(f_free)
            h = jax.hessian(objective)(f_free)
            h = h + 1e-8 * jnp.eye(h.shape[0], dtype=h.dtype)
            step = jnp.linalg.solve(h, g)
            norm = jnp.linalg.norm(step)
            step = step * jnp.minimum(1.0, 10.0 / jnp.maximum(norm, 1e-30))
            return f_free - step

        f_free = jax.lax.fori_loop(0, newton_iters, newton_step,
                                   fs[1:] - fs[0])
        fs = jnp.concatenate([jnp.zeros((1,), L.dtype), f_free])

    ld = log_denom(fs)                                      # internal gauge
    f_all = -logsumexp(L - ld[None, :], axis=1)             # all K states
    # Re-gauge so the OUTPUT reference is state 0 (shifting f and the
    # denominator together is the MBAR gauge freedom; W is invariant).
    f_out = f_all - f_all[0]
    ld_out = ld - f_all[0]

    counts_arr = jnp.asarray(counts_np, L.dtype)
    weights = jnp.exp(f_out[None, :] + L.T - ld_out[:, None])   # (N, K)
    theta = _mbar_theta(weights, counts_arr)
    var = jnp.maximum(
        jnp.diag(theta) + theta[0, 0] - 2.0 * theta[0, :], 0.0)
    return MBARResult(free_energies=f_out, stderrs=jnp.sqrt(var),
                      theta=theta, log_denominator=ld_out,
                      counts=counts_arr, log_probs=L)


def mbar_from_samples(log_prob_fns, samples, **kwargs) -> MBARResult:
    """Convenience MBAR entry point: K log-density callables + K
    per-state sample arrays -> pooled (K, N) matrix ->
    :func:`mbar_free_energy`.  ``samples[k]`` has shape
    ``(n_k, dof...)``; each callable maps the pooled ``(N, dof...)``
    array to ``(N,)`` log densities (same contract as the MC engine's
    ``energy_func``)."""
    counts = [int(np.asarray(s).shape[0]) for s in samples]
    pooled = jnp.concatenate([jnp.asarray(s) for s in samples], axis=0)
    L = jnp.stack([fn(pooled) for fn in log_prob_fns])
    return mbar_free_energy(L, counts, **kwargs)


def mbar_perturbed_free_energy(result: MBARResult,
                               log_prob_new: Array) -> Tuple[Array, Array]:
    """Free energy ``dF(0->new)`` of an UNSAMPLED state by MBAR
    reweighting: ``log_prob_new`` is the new state's unnormalized log
    density at the pooled samples, shape (N,).  The standard error is
    the full augmented-state asymptotic covariance (appending the new
    state with zero counts leaves the solution unchanged but yields its
    variance — pymbar's ``computePerturbedFreeEnergies``)."""
    lnew = jnp.asarray(log_prob_new)
    f_new = -logsumexp(lnew - result.log_denominator)
    w_new = jnp.exp(f_new + lnew - result.log_denominator)      # (N,)
    weights = jnp.exp(result.free_energies[None, :] + result.log_probs.T
                      - result.log_denominator[:, None])
    w_aug = jnp.concatenate([weights, w_new[:, None]], axis=1)
    counts_aug = jnp.concatenate(
        [result.counts, jnp.zeros((1,), result.counts.dtype)])
    theta = _mbar_theta(w_aug, counts_aug)
    var = jnp.maximum(theta[-1, -1] + theta[0, 0] - 2.0 * theta[0, -1], 0.0)
    return f_new, jnp.sqrt(var)


def mbar_expectation(result: MBARResult, values: Array,
                     state=0) -> Tuple[Array, Array]:
    """Equilibrium expectation ``<A>_state`` by MBAR reweighting of the
    pooled samples.  ``values``: (N,) observable at the pooled samples;
    ``state``: sampled-state index, or an (N,) array of a (possibly
    unsampled) target state's unnormalized log density.  Returns
    ``(mean, stderr)`` with the importance-sampling delta-method error
    (weight-variance only; free-energy uncertainty not propagated)."""
    values = jnp.asarray(values)
    # Integer scalars of any flavor (python int, numpy, 0-d jax array)
    # are state INDICES; only a (N,) array is a log-density.
    is_index = isinstance(state, (int, np.integer)) or (
        hasattr(state, "ndim") and state.ndim == 0
        and jnp.issubdtype(jnp.asarray(state).dtype, jnp.integer))
    if is_index:
        logw = (result.free_energies[state] + result.log_probs[state]
                - result.log_denominator)
    else:
        lnew = jnp.asarray(state)
        if lnew.shape != result.log_denominator.shape:
            raise ValueError(
                f"state must be an integer index or a per-pooled-sample "
                f"log-density array of shape "
                f"{result.log_denominator.shape}; got {lnew.shape}")
        logw = -logsumexp(lnew - result.log_denominator) + lnew \
            - result.log_denominator
    logw = logw - logsumexp(logw)                # exact normalization
    w = jnp.exp(logw)
    mean = jnp.sum(w * values)
    stderr = jnp.sqrt(jnp.sum((w * (values - mean)) ** 2))
    return mean, stderr


class AISResult(NamedTuple):
    """Output of :func:`ais`.

    log_z: estimate of ``ln(Z_target / Z_init)`` (log-mean-exp of the
        per-chain log weights) — a consistent estimator whose
        expectation-of-exp is unbiased (log is a stochastic lower bound).
    log_weights: per-chain AIS log importance weights, shape (n_chains,).
    samples: final chain states (approximately distributed ~ target).
    ess: effective sample size of the normalized weights,
        ``(sum w)^2 / sum w^2``  in [1, n_chains].
    acceptance: mean MH acceptance over all transition sweeps.
    """
    log_z: Array
    log_weights: Array
    samples: Array
    ess: Array
    acceptance: Array


def _systematic_resample(log_norm_w: Array, key: Array) -> Array:
    """Systematic resampling: ancestor indices from one uniform draw.

    Lower variance than multinomial; TPU-friendly as one cumsum + one
    searchsorted over the fixed chain axis."""
    n = log_norm_w.shape[0]
    cdf = jnp.cumsum(jnp.exp(log_norm_w))
    cdf = cdf / cdf[-1]  # exact 1.0 endpoint despite rounding
    u = (jax.random.uniform(key, (), dtype=cdf.dtype)
         + jnp.arange(n, dtype=cdf.dtype)) / n
    return jnp.clip(jnp.searchsorted(cdf, u), 0, n - 1)


def ais(log_prob_init: Callable[[Array], Array],
        log_prob_target: Callable[[Array], Array],
        x0: Array,
        key: Array,
        *,
        betas: Optional[Array] = None,
        n_stages: int = 64,
        kind: str = "random_walk",
        scale: float = 0.1,
        n_leapfrog: int = 10,
        sweeps_per_stage: int = 1,
        resample_threshold: Optional[float] = None) -> AISResult:
    """Annealed importance sampling from an exactly-sampleable initial
    distribution to an unnormalized target (Neal 2001).

    ``x0``: (n_chains, dof) exact samples from the (normalized) initial
    distribution — e.g. a trained flow prior's ``sample`` (flow-annealed
    AIS: the better the flow fits the target, the shorter the ladder
    needed).  The annealing path is geometric in density,
    ``log pi_b = (1 - b) log_prob_init + b log_prob_target``, over
    ``betas`` (default: linear 0 -> 1 with ``n_stages`` stages).  Each
    stage adds the weight increment at the current state and then runs
    ``sweeps_per_stage`` MH transitions targeting ``pi_b`` using the
    production local-move kernel (``kind`` in {"random_walk", "mala",
    "hmc"} — with ``n_leapfrog`` leapfrog steps for HMC —
    mcmc.moves._scaled_trial, the exact kernel run_mcmc uses).

    One ``lax.scan`` over stages (inner ``fori_loop`` over sweeps),
    vmapped over chains by batching: jit/shard the call as one program.
    Estimates ``ln(Z_target/Z_init)``; for a *free-energy difference*
    between two unnormalized states, either run twice against a common
    reference or note ``dF(init->target) = -log_z`` when the initial
    log-density is normalized.  Reverse-AIS stochastic upper bounds
    follow by swapping the roles when exact target samples exist
    (then ``-log_z`` of the swapped run upper-bounds the original).

    ``resample_threshold`` (fraction of n_chains, e.g. 0.5) turns the
    run into a sequential Monte Carlo sampler: whenever the weight ESS
    drops below ``threshold * n_chains`` the population is
    systematically resampled (one cumsum + searchsorted, fixed shapes
    under ``lax.cond``) and the running ``ln Z`` absorbs the
    log-mean-weight — the standard cure for AIS weight collapse on
    hard/multimodal targets.  ``log_weights`` then holds the residual
    post-resampling weights (``log_z`` remains the total estimate).
    """
    if betas is None:
        betas = jnp.linspace(0.0, 1.0, n_stages + 1)
    betas = jnp.asarray(betas)
    d_betas = betas[1:] - betas[:-1]

    x0 = jnp.asarray(x0)
    n_chains = x0.shape[0]

    def interp(x, b):
        return (1.0 - b) * log_prob_init(x) + b * log_prob_target(x)

    def maybe_resample(x, logw, log_z_acc, k):
        log_norm = logw - logsumexp(logw)
        ess = jnp.exp(-logsumexp(2.0 * log_norm))

        def do(_):
            idx = _systematic_resample(log_norm, k)
            return (jnp.take(x, idx, axis=0),
                    jnp.zeros_like(logw),
                    log_z_acc + _log_mean_exp(logw))

        return jax.lax.cond(
            ess < resample_threshold * n_chains, do,
            lambda _: (x, logw, log_z_acc), None)

    def stage(carry, inp):
        x, logw, log_z_acc, k = carry
        b, db = inp
        # Weight increment: (b_k - b_{k-1}) (log p~_target - log p_init)
        # at the CURRENT state (distributed ~ pi_{b_{k-1}}).
        logw = logw + db * (log_prob_target(x) - log_prob_init(x))
        k, k_rs = jax.random.split(k)
        if resample_threshold is not None:
            x, logw, log_z_acc = maybe_resample(x, logw, log_z_acc, k_rs)
        lt = lambda y: interp(y, b)
        e = lt(x)

        def sweep(_, c):
            x, e, k, acc = c
            k, sub = jax.random.split(k)
            x, e, accept = _scaled_trial(kind, lt, x, e, scale, sub,
                                         n_leapfrog=n_leapfrog)
            return x, e, k, acc + jnp.mean(accept)

        x, e, k, acc = jax.lax.fori_loop(
            0, sweeps_per_stage, sweep,
            (x, e, k, jnp.asarray(0.0, jnp.float32)))
        return (x, logw, log_z_acc, k), acc / sweeps_per_stage

    (x, logw, log_z_acc, _), accs = jax.lax.scan(
        stage,
        (x0, jnp.zeros(n_chains, x0.dtype),
         jnp.asarray(0.0, x0.dtype), key),
        (betas[1:], d_betas))

    log_z = log_z_acc + _log_mean_exp(logw)
    log_norm = logw - logsumexp(logw)
    ess = jnp.exp(-logsumexp(2.0 * log_norm))
    return AISResult(log_z=log_z, log_weights=logw, samples=x,
                     ess=ess, acceptance=jnp.mean(accs))


def gauss_legendre_lambdas(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Gauss-Legendre nodes/weights mapped to the unit interval, the
    standard lambda schedule for :func:`ti_free_energy`: sample each
    state at ``nodes[k]``, integrate with ``weights[k]`` (which sum to
    1).  Host-side numpy — the schedule is a static experiment design,
    not traced.  An n-point rule is exact for polynomial
    ``<dU/dlam>(lam)`` up to degree 2n-1, so smooth soft-core ladders
    converge much faster than trapezoids on the same budget."""
    x, w = np.polynomial.legendre.leggauss(int(n))
    return (0.5 * (x + 1.0)).astype(np.float64), (0.5 * w).astype(np.float64)


def ti_free_energy(dudl: Array, lambdas=None, *, weights=None,
                   statistical_inefficiency=1.0) -> Tuple[Array, Array]:
    """Thermodynamic integration ``dF = integral_0^1 <dU/dlam>_lam dlam``
    from per-state samples of the REDUCED (beta-multiplied) alchemical
    derivative.

    ``dudl``: ``(K, n_samples...)`` — row ``k`` holds equilibrium
    samples of ``dU/dlam`` at state ``k`` (trailing axes are all
    flattened as samples; e.g. ``jax.grad(energy, argnums=1)`` of
    :func:`~vaemolsim_tpu.potentials.lennard_jones_softcore` over an
    HREX or per-state MC run).  Exactly one of

    - ``weights``: ``(K,)`` quadrature weights on [0, 1] (pair with
      :func:`gauss_legendre_lambdas`), or
    - ``lambdas``: ``(K,)`` sorted grid — composite trapezoid weights
      are built from it (endpoints 0 and 1 should be included)

    selects the quadrature.  The standard error propagates each
    state's independent SEM through the quadrature,
    ``sqrt(sum_k w_k^2 g_k var_k / n_k)``; pass per-state (or scalar)
    ``statistical_inefficiency`` ``g`` (e.g.
    :func:`~vaemolsim_tpu.mcmc.diagnostics.statistical_inefficiency`)
    for correlated chains — the default 1 assumes independent samples.
    Returns ``(delta_f, stderr)`` in reduced units, the integration
    complement of the perturbative estimators (EXP/BAR/MBAR): TI needs
    only the derivative at each state, no configuration overlap
    between neighbors."""
    dudl = jnp.asarray(dudl)
    k = dudl.shape[0]
    flat = dudl.reshape(k, -1)
    n = flat.shape[1]
    if (weights is None) == (lambdas is None):
        raise ValueError("pass exactly one of weights= or lambdas=")
    if weights is not None:
        w = jnp.asarray(weights, flat.dtype)
    else:
        lam = jnp.asarray(lambdas, flat.dtype)
        if lam.shape != (k,):
            raise ValueError(f"lambdas must be ({k},); got {lam.shape}")
        d = jnp.diff(lam)
        w = 0.5 * (jnp.concatenate([d, jnp.zeros(1, d.dtype)])
                   + jnp.concatenate([jnp.zeros(1, d.dtype), d]))
    if w.shape != (k,):
        raise ValueError(f"weights must be ({k},); got {w.shape}")
    means = jnp.mean(flat, axis=1)
    var = jnp.var(flat, axis=1)
    g = jnp.broadcast_to(
        jnp.asarray(statistical_inefficiency, flat.dtype), (k,))
    delta_f = jnp.sum(w * means)
    stderr = jnp.sqrt(jnp.sum(w * w * g * var / n))
    return delta_f, stderr


# --- targeted free-energy perturbation (learned-map FEP) ---------------

def _resolve_map(bijector, map_and_log_det, inverse):
    """Normalize the two map-specification styles to one callable
    ``x -> (y, log|det J|)``."""
    if (bijector is None) == (map_and_log_det is None):
        raise ValueError(
            "pass exactly one of bijector= or map_and_log_det=")
    if map_and_log_det is not None:
        if inverse:
            raise ValueError(
                "inverse=True only applies to bijector=; a "
                "map_and_log_det= callable is used as given — pass the "
                "reverse-direction callable instead")
        return map_and_log_det
    if inverse:
        return bijector.inverse_and_log_det
    return bijector.forward_and_log_det


def targeted_work_values(log_prob_from: Callable[[Array], Array],
                         log_prob_to: Callable[[Array], Array],
                         samples: Array, *,
                         bijector=None,
                         map_and_log_det: Optional[Callable] = None,
                         inverse: bool = False) -> Array:
    """Flow-mapped (targeted) reduced work — Wirnsberger et al.,
    J. Chem. Phys. 153, 144112 (2020).

    For an invertible map ``M`` from the *from* configuration space to
    the *to* space and samples ``x ~ p_from``:

        w_T = log p~_from(x) - log p~_to(M(x)) - log|det J_M(x)|

    ``dF = -ln < exp(-w_T) >_from`` exactly as for plain
    :func:`work_values` (``M = Identity`` recovers it), but the variance
    shrinks as ``M`` pushes ``p_from`` onto ``p_to`` — if the pushforward
    is exact, every ``w_T`` equals ``dF`` and one sample suffices.  Train
    ``M`` by minimizing :func:`tfep_loss`.

    The map is given either as ``bijector=`` (any
    :class:`~vaemolsim_tpu.ops.bijectors.Bijector` — a trained flow's
    transform; set ``inverse=True`` to use its inverse direction for the
    reverse leg) or ``map_and_log_det=`` (callable
    ``x -> (y, log|det J|)``); pass exactly one.  Batched over the
    leading axis of ``samples``; log-det must reduce over event dims
    (the Bijector contract).

    Beyond-reference capability: the reference trains flows
    (vaemolsim/flows.py) but has no free-energy layer to point them at.
    """
    fwd = _resolve_map(bijector, map_and_log_det, inverse)
    mapped, ldj = fwd(samples)
    lp = log_prob_from(samples)
    if jnp.shape(ldj) != jnp.shape(lp):
        raise ValueError(
            f"log-det shape {jnp.shape(ldj)} does not match log-prob shape "
            f"{jnp.shape(lp)}; wrap scalar bijectors in ops.bijectors.Block "
            "so the log-det reduces over event dims")
    return lp - log_prob_to(mapped) - ldj


def targeted_bar(log_prob_a: Callable[[Array], Array],
                 log_prob_b: Callable[[Array], Array],
                 samples_a: Array, samples_b: Array, *,
                 bijector=None,
                 map_and_log_det: Optional[Callable] = None,
                 inverse_map_and_log_det: Optional[Callable] = None,
                 iters: int = 100) -> Tuple[Array, Array]:
    """Bidirectional targeted FEP: BAR on flow-mapped work from both
    ends (Wirnsberger et al. 2020, learned-map generalization of
    Bennett).

    Forward work maps ``samples_a ~ p_a`` through ``M``; reverse work
    maps ``samples_b ~ p_b`` through ``M^{-1}``.  With ``bijector=`` both
    directions come from the one object (guaranteeing they invert each
    other); with callables pass BOTH ``map_and_log_det`` and
    ``inverse_map_and_log_det``.  Returns ``(delta_f(a->b), stderr)``
    from :func:`bar_free_energy`.
    """
    if bijector is not None:
        if map_and_log_det is not None or inverse_map_and_log_det is not None:
            raise ValueError("pass bijector= or the callable pair, not both")
        fwd, inv = bijector.forward_and_log_det, bijector.inverse_and_log_det
    else:
        if map_and_log_det is None or inverse_map_and_log_det is None:
            raise ValueError(
                "without bijector=, pass both map_and_log_det= and "
                "inverse_map_and_log_det=")
        fwd, inv = map_and_log_det, inverse_map_and_log_det
    w_f = targeted_work_values(log_prob_a, log_prob_b, samples_a,
                               map_and_log_det=fwd)
    w_r = targeted_work_values(log_prob_b, log_prob_a, samples_b,
                               map_and_log_det=inv)
    return bar_free_energy(w_f, w_r, iters=iters)


def tfep_loss(log_prob_from: Callable[[Array], Array],
              log_prob_to: Callable[[Array], Array],
              samples: Array, *,
              bijector=None,
              map_and_log_det: Optional[Callable] = None) -> Array:
    """Training objective for the targeted map: the mean mapped work
    ``< w_T >_from = KL(M#p_from || p_to) + dF >= dF`` (Gibbs
    inequality), so minimizing it both tightens the one-sided bound and
    drives the EXP estimator's variance to zero.  Samples are treated as
    fixed data (reweighting-free, simulation-free training — the TFEP
    protocol); differentiate w.r.t. the map parameters inside
    ``bijector``/``map_and_log_det``.
    """
    return jnp.mean(targeted_work_values(
        log_prob_from, log_prob_to, samples,
        bijector=bijector, map_and_log_det=map_and_log_det))
