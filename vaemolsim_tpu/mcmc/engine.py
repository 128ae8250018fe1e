"""VAE-proposal Metropolis Monte Carlo, fully on-device.

TPU-first replacement for vaemolsim/mcmc.py (reference L6).  The
reference's engine crosses the framework/NumPy boundary >= 4x per step and
makes 6 un-jitted eager model calls (SURVEY.md §3.3).  Here one MC step is
a single pure function — propose -> decode -> log-prob -> Metropolis — and
``run`` is one ``lax.scan`` over steps, so the sampling inner loop never
leaves the chip.  Chains are the batch axis of every distribution call
(the reference's own batching semantics, mcmc.py:84-90), shardable over a
device mesh via ``vaemolsim_tpu.parallel``.

Sign convention (preserved from the reference, mcmc.py:116, confirmed by
the MC notebook passing ``data_dist.log_prob`` as energy_func):
``energy_func``/``log_target_fn`` returns the LOG TARGET DENSITY
(-beta*U up to a constant), and

    log_acc = log_pi(x2) + log q(reverse) - log_pi(x1) - log q(forward).

Proposal structure (mcmc.py:99-109):
    forward: z1 ~ q(.|x1),  z2 ~ p(.|z1-shape),  x2 ~ q(.|z2)
    reverse: log q(z2|x2) + log p(z1) + log q(x1|z1)
"""

from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

Array = jax.Array

__all__ = ["Counter", "MCMCState", "apply_mh", "mh_propose",
           "make_mcmc_step", "run_mcmc", "MCMC", "log_uniform"]


def log_uniform(key: Array, shape, dtype) -> Array:
    """The MH accept draw ``log U``, ``U ~ Uniform(1e-38, 1)`` — the
    clamp keeps ``log`` finite in float32 so a zero draw can never
    force-accept via ``-inf >= -inf``.  ONE implementation shared by
    every kernel (engine, local moves, fused proposal, NPT) so the
    clamp semantics cannot diverge."""
    return jnp.log(jax.random.uniform(key, shape, dtype=dtype,
                                      minval=1e-38))

_COUNTER_BASE = 1 << 30


@struct.dataclass
class Counter:
    """Exact wide event counter: two int32 words in base 2**30.

    Counts are exact integers; float32 loses integer exactness past
    2^24 (~0.2 s of trials at the benched 100M proposals/s) and a single
    int32 wraps at 2.1e9 (~20 s at that rate, e.g. 50k chains x 43k
    steps in one scan), yielding negative counts.  Two base-2**30 words
    are exact to 2^61 events (~700 years at 100M/s) and stay in plain
    int32 lanes (jax_enable_x64 not required).  Per-step increments must
    be < 2**30 (i.e. < 1e9 chains per device — always true).
    """

    lo: Array  # () int32 in [0, 2**30)
    hi: Array  # () int32

    @classmethod
    def zero(cls) -> "Counter":
        return cls(lo=jnp.asarray(0, jnp.int32), hi=jnp.asarray(0, jnp.int32))

    @classmethod
    def of(cls, n: int) -> "Counter":
        n = int(n)
        return cls(lo=jnp.asarray(n % _COUNTER_BASE, jnp.int32),
                   hi=jnp.asarray(n // _COUNTER_BASE, jnp.int32))

    def add(self, n) -> "Counter":
        """Add a non-negative increment (< 2**30): Python int or traced
        int32 scalar.  max lo + max increment < 2**31, so the raw add
        never overflows before the carry split."""
        lo = self.lo + jnp.asarray(n, jnp.int32)
        return Counter(lo=lo % _COUNTER_BASE, hi=self.hi + lo // _COUNTER_BASE)

    def to_float(self) -> Array:
        """float32 value (relative error <= ~1e-7 — fine for rates)."""
        return (self.hi.astype(jnp.float32) * float(_COUNTER_BASE)
                + self.lo.astype(jnp.float32))

    def __int__(self) -> int:
        return int(self.hi) * _COUNTER_BASE + int(self.lo)

    def __float__(self) -> float:
        return float(int(self))


@struct.dataclass
class MCMCState:
    """Carry of the scanned MC loop; checkpointable as a pytree
    (SURVEY.md §5.3: chain state = configs, energies, rng key, stats)."""

    configs: Array  # (n_chains, n_dofs)
    energies: Array  # (n_chains,) log target density values
    key: Array
    num_trials: Counter
    num_acc: Counter

    @property
    def acceptance_rate(self) -> Array:
        return self.num_acc.to_float() / self.num_trials.to_float()

    @classmethod
    def create(cls, configs: Array, energies: Array,
               key: Array) -> "MCMCState":
        return cls(configs=jnp.asarray(configs),
                   energies=jnp.asarray(energies), key=key,
                   num_trials=Counter.zero(), num_acc=Counter.zero())


def apply_mh(state: MCMCState, x2: Array, e2: Array, accept: Array,
             key: Array) -> MCMCState:
    """Shared accept/select/bookkeeping tail of every MH kernel (engine,
    local moves, tempered replica phases): one implementation so counter
    semantics cannot diverge between kernels."""
    return MCMCState(
        configs=jnp.where(accept[..., None], x2, state.configs),
        energies=jnp.where(accept, e2, state.energies), key=key,
        num_trials=state.num_trials.add(accept.size),
        num_acc=state.num_acc.add(jnp.sum(accept, dtype=jnp.int32)))


def mh_propose(encoder_fn: Callable[[Array], Any],
               prior_fn: Callable[[Array], Any],
               decoder_fn: Callable[[Array], Any],
               log_target_fn: Callable[[Array], Array],
               x1: Array, l1: Array, key: Array,
               beta=1.0) -> Tuple[Array, Array, Array]:
    """One VAE-proposed Metropolis-Hastings trial, shared by the plain
    engine (beta=1) and the tempered replica-exchange kernel.

    Returns ``(x2, l2, accept)`` where ``l2`` is the *untempered* log
    target density at the proposal and ``accept`` the per-chain decision
    with the tempered criterion
    ``log_acc = beta*(l2 - l1) + reverse - forward``
    (reference sign convention, vaemolsim/mcmc.py:116).
    """
    k1, k2, k3, k4 = jax.random.split(key, 4)

    # Forward proposal (reference mcmc.py:99-103).
    enc1 = encoder_fn(x1)
    z1, log_z1_given_x1 = enc1.sample_and_log_prob(k1)
    prior1 = prior_fn(z1)
    # A static/fixed prior has no chain axis of its own: draw one latent
    # PER CHAIN (a shared draw would silently correlate every chain's
    # move and bias the sampler).
    if tuple(prior1.batch_shape) == ():
        z2, log_z2 = prior1.sample_and_log_prob(k2, z1.shape[:-1])
    else:
        z2, log_z2 = prior1.sample_and_log_prob(k2)
    dec2 = decoder_fn(z2)
    x2, log_x2_given_z2 = dec2.sample_and_log_prob(k3)
    forward_log_p = log_z1_given_x1 + log_z2 + log_x2_given_z2

    # Reverse proposal (reference mcmc.py:106-109).
    log_z2_given_x2 = encoder_fn(x2).log_prob(z2)
    log_z1 = prior_fn(z2).log_prob(z1)
    log_x1_given_z1 = decoder_fn(z1).log_prob(x1)
    reverse_log_p = log_z2_given_x2 + log_z1 + log_x1_given_z1

    l2 = log_target_fn(x2)
    log_acc = beta * (l2 - l1) + reverse_log_p - forward_log_p
    return x2, l2, log_acc >= log_uniform(k4, log_acc.shape,
                                          log_acc.dtype)


def make_mcmc_step(encoder_fn: Callable[[Array], Any],
                   prior_fn: Callable[[Array], Any],
                   decoder_fn: Callable[[Array], Any],
                   log_target_fn: Callable[[Array], Array]
                   ) -> Callable[[MCMCState], MCMCState]:
    """Build the fused single-step kernel from distribution factories.

    Each ``*_fn`` maps a batched array to a distribution pytree (chains =
    batch axis).  Use ``vae_proposal_fns`` for the standard VAE wiring.
    """

    def step(state: MCMCState) -> MCMCState:
        key, sub = jax.random.split(state.key)
        x2, e2, accept = mh_propose(encoder_fn, prior_fn, decoder_fn,
                                    log_target_fn, state.configs,
                                    state.energies, sub)
        return apply_mh(state, x2, e2, accept, key)

    return step


def _scan_unroll(length: int, unroll: int) -> int:
    """Largest divisor of ``length`` that is <= ``unroll`` (lax.scan
    requires the unroll factor to divide the trip count)."""
    unroll = max(min(unroll, length if length else 1), 1)
    while length % unroll:
        unroll -= 1
    return unroll


def run_mcmc(step_fn: Callable[[MCMCState], MCMCState], state: MCMCState,
             n_steps: int, collect_every: int = 0, unroll: int = 8
             ) -> Tuple[MCMCState, Optional[Array]]:
    """Scan ``n_steps`` MC steps on device.

    With ``collect_every=k > 0``, also returns the configurations of every
    k-th step stacked as ``(n_steps//k, n_chains, n_dofs)`` (trajectory
    collection the reference does by hand in notebooks).

    ``unroll`` unrolls the scan body (v5e sweep at 10k chains: 78.7M
    props/s at 1, 83.6M at 4, 84.9M at 8, regressing by 16 — the
    unrolled body overlaps per-step overheads); the largest divisor of
    the trip count <= ``unroll`` is used.  It never changes results.
    """
    if collect_every and n_steps % collect_every != 0:
        raise ValueError("n_steps must be a multiple of collect_every")

    if not collect_every:
        def body(s, _):
            return step_fn(s), None

        state, _ = jax.lax.scan(body, state, None, length=n_steps,
                                unroll=_scan_unroll(n_steps, unroll))
        return state, None

    def outer(s, _):
        def inner(s2, _):
            return step_fn(s2), None

        s, _ = jax.lax.scan(inner, s, None, length=collect_every,
                            unroll=_scan_unroll(collect_every, unroll))
        return s, s.configs

    state, traj = jax.lax.scan(outer, state, None,
                               length=n_steps // collect_every)
    return state, traj


def run_mcmc_checkpointed(step_fn, state: MCMCState, n_steps: int,
                          checkpoint_every: int, manager) -> MCMCState:
    """Run in segments, checkpointing the full chain state (configs,
    energies, PRNG key, acceptance stats) every ``checkpoint_every``
    steps — the fault-tolerance capability of SURVEY.md §5.3.  Resume by
    restoring the latest state from ``manager``
    (train.CheckpointManager) and calling again with the remaining steps.

    Checkpoint step numbers continue from the manager's latest step, so
    a resumed run never reuses step ids (orbax silently drops saves to
    an existing step, and latest-step/retention ordering would pick the
    stale pre-crash checkpoints).
    """
    base = manager.latest_step() or 0
    done = 0
    run = jax.jit(lambda s, n: run_mcmc(step_fn, s, n)[0],
                  static_argnums=1)
    while done < n_steps:
        seg = min(checkpoint_every, n_steps - done)
        state = run(state, seg)
        done += seg
        jax.block_until_ready(state.configs)
        manager.save(base + done, state)
    return state


def vae_proposal_fns(vae, train: bool = False):
    """Standard wiring of a trained ``models.VAE`` into the engine."""

    def encoder_fn(x):
        return vae.encoder(x, train=train)

    def prior_fn(z):
        # VAE._prior_dist already dispatches raw distributions vs layers.
        return vae._prior_dist(z, train)

    def decoder_fn(z):
        return vae.decoder(z, train=train)

    return encoder_fn, prior_fn, decoder_fn


class MCMC:
    """Convenience driver mirroring the reference API
    (vaemolsim/mcmc.py:12-159): ``single_step``, ``run``,
    ``acceptance_rate``, ``reset`` — but with the compute as one jitted
    scan.  ``energy_func`` keeps the reference's convention: it must
    return the LOG target density (see module docstring).
    """

    def __init__(self, vae, energy_func: Callable[[Array], Array],
                 random_seed: Optional[int] = None):
        self.vae = vae
        self.energy_func = energy_func
        enc, pri, dec = vae_proposal_fns(vae)
        self._step = make_mcmc_step(enc, pri, dec, energy_func)
        self._jit_run = jax.jit(
            lambda st, n: run_mcmc(self._step, st, n)[0],
            static_argnums=1)
        self.reset(random_seed)

    @property
    def acceptance_rate(self) -> float:
        if self._num_trials == 0:
            return float("nan")  # matches MCMCState's 0/0 semantics
        return self._num_acc / self._num_trials

    def reset(self, random_seed: Optional[int] = None) -> None:
        # Python ints: arbitrary precision, no wrap/precision class at all.
        self._num_trials = 0
        self._num_acc = 0
        self._key = jax.random.PRNGKey(
            0 if random_seed is None else random_seed)

    def _state(self, configs, energies) -> MCMCState:
        configs = jnp.asarray(configs)
        if energies is None:
            energies = self.energy_func(configs)
        self._key, sub = jax.random.split(self._key)
        return MCMCState.create(configs, energies, sub)

    def single_step(self, configs, energies=None):
        state = self._jit_run(self._state(configs, energies), 1)
        self._num_trials += int(state.num_trials)
        self._num_acc += int(state.num_acc)
        return state.configs, state.energies

    def run(self, configs, energies=None, n_steps: int = 1):
        state = self._jit_run(self._state(configs, energies), n_steps)
        self._num_trials += int(state.num_trials)
        self._num_acc += int(state.num_acc)
        return state.configs, state.energies
