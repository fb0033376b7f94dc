"""MCMC driver: warmup-adapted NUTS over vmapped chains.

Replaces the reference's NumPyro ``MCMC(NUTS(...))`` stack
(``lqg/infer/utils.py:14-39``) with a native, fully jittable driver:

* warmup adaptation + sampling compile to ONE chunk program (adaptation
  gated by per-step flags) that is re-launched in fixed-size segments, with
  chains ``vmap``-ed as a batch axis, not processes (the reference
  dispatches chains over host devices, ``numpyro.set_host_device_count(4)``
  at ``main.py:8``); segmenting gives progress, in-flight checkpointing,
  and bounded per-launch device time;
* on a device mesh, chains shard over devices via ``jax.sharding`` (see
  :mod:`lqg_tpu.parallel`).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax, random

from lqg_tpu.infer import adaptation as adapt
from lqg_tpu.infer.hmc import nuts_step
from lqg_tpu.infer.models import ProbModel


class ChainState(NamedTuple):
    z: jnp.ndarray
    pe: jnp.ndarray
    grad: jnp.ndarray
    step_size: jnp.ndarray
    inv_mass: jnp.ndarray
    da: adapt.DualAveragingState
    welford: adapt.WelfordState
    rng_key: jnp.ndarray


class MCMC:
    """Run NUTS on a :class:`ProbModel`.

    Args:
        model: the probabilistic model (potential + transforms).
        num_warmup / num_samples: warmup and kept draws per chain.
        num_chains: chains, run as a vmapped batch axis.
        max_depth: NUTS maximum tree depth.
        target_accept: dual-averaging target acceptance probability.
        thinning: keep every k-th sample.
    """

    def __init__(self, model: ProbModel, num_warmup: int = 1000,
                 num_samples: int = 1000, num_chains: int = 1,
                 max_depth: int = 10, target_accept: float = 0.8,
                 init_jitter: float = 0.2, thinning: int = 1,
                 progress: bool = False, chunk_steps: Optional[int] = None):
        self.model = model
        self.num_warmup = num_warmup
        self.num_samples = num_samples
        self.num_chains = num_chains
        self.max_depth = max_depth
        self.target_accept = target_accept
        self.init_jitter = init_jitter
        self.thinning = thinning
        self.progress = progress
        # steps per device launch: the run is segmented into fixed-size
        # compiled chunks (one compile, reused) instead of one monolithic
        # program - a multi-hour single XLA execution cannot report
        # progress, cannot be checkpointed, and trips infrastructure
        # watchdogs on remote-attached accelerators.  Default: small
        # launches on TPU (a single early-warmup NUTS step at max_depth=10
        # can run ~2^depth leapfrogs; multi-step launches were observed to
        # trip the remote-TPU execution watchdog), larger on CPU where
        # launches are cheap and there is no watchdog.
        if chunk_steps is None:
            chunk_steps = 1 if jax.default_backend() == "tpu" else 64
        self.chunk_steps = max(1, int(chunk_steps))
        self._samples_u = None
        self._extra = None

    # --- chain programs ---
    def _init_chain(self, rng_key, z0):
        potential = self.model.potential
        zdim = z0.shape[0]

        key_init, key_ss, key_run = random.split(rng_key, 3)

        pe0, grad0 = jax.value_and_grad(potential)(z0)
        inv_mass0 = jnp.ones(zdim)
        step0 = adapt.find_reasonable_step_size(
            potential, inv_mass0, z0, pe0, grad0, key_ss)

        return ChainState(
            z=z0, pe=pe0, grad=grad0,
            step_size=step0, inv_mass=inv_mass0,
            da=adapt.da_init(step0),
            welford=adapt.welford_init(zdim),
            rng_key=key_run,
        )

    def _run_chunk(self, state: ChainState, flags):
        """Scan a fixed-size chunk of warmup/sampling steps (adaptation
        gated by per-step flags), so the NUTS graph compiles exactly once
        and is re-launched per chunk."""
        potential = self.model.potential
        zdim = state.z.shape[0]

        def step_fn(state: ChainState, inp):
            is_warmup, in_win, win_end, freeze = inp
            key, sub = random.split(state.rng_key)
            z, pe, grad, info = nuts_step(
                potential, sub, state.z, state.pe, state.grad,
                state.step_size, state.inv_mass, max_depth=self.max_depth)

            # --- adaptation (warmup only) ---
            da = adapt.da_update(state.da, info.accept_prob,
                                 target=self.target_accept)
            da = jax.tree.map(lambda new, old: jnp.where(is_warmup, new, old),
                              da, state.da)
            step_size = jnp.where(is_warmup, jnp.exp(da.log_step),
                                  state.step_size)

            welford = jax.tree.map(
                lambda old, new: jnp.where(in_win, new, old),
                state.welford, adapt.welford_update(state.welford, z))

            # close a slow window: adopt the variance as inverse mass,
            # reset the accumulator and restart dual averaging
            new_mass = adapt.welford_variance(welford)
            inv_mass = jnp.where(win_end, new_mass, state.inv_mass)
            da_reset = adapt.da_init(jnp.exp(da.log_step_avg))
            da = jax.tree.map(lambda r, c: jnp.where(win_end, r, c),
                              da_reset, da)
            welford = jax.tree.map(
                lambda w, fresh: jnp.where(win_end, fresh, w),
                welford, adapt.welford_init(zdim))
            step_size = jnp.where(win_end, jnp.exp(da.log_step), step_size)

            # end of warmup: freeze the dual-averaged step size
            step_size = jnp.where(freeze, jnp.exp(da.log_step_avg),
                                  step_size)

            new_state = ChainState(z=z, pe=pe, grad=grad,
                                   step_size=step_size, inv_mass=inv_mass,
                                   da=da, welford=welford, rng_key=key)
            out = (z, info.accept_prob, info.diverging, info.num_steps,
                   info.tree_depth, pe)
            return new_state, out

        return lax.scan(step_fn, state, flags)

    def run(self, rng_key, checkpoint_path: Optional[str] = None,
            chain_sharding=None):
        """Run all chains; returns self for chaining.

        The run executes as ``ceil(total / chunk_steps)`` device launches of
        one compiled chunk program (plus one init program); per-chunk
        results stream back to host and are concatenated at the end.

        Args:
            checkpoint_path: if given, the full in-flight run state (chain
                states + accumulated draws) is written there after every
                chunk, and an existing compatible checkpoint at that path is
                resumed from instead of starting over.
            chain_sharding: optional ``jax.sharding.Sharding`` for the chain
                axis; per-chain keys and initial positions are placed with
                it, so XLA partitions the whole warmup+sampling program SPMD
                over the mesh (used by
                :func:`lqg_tpu.parallel.sharding.sharded_chains_run`).
        """
        import numpy as np

        total = self.num_warmup + self.num_samples * self.thinning
        chunk = min(self.chunk_steps, total)
        n_chunks = -(-total // chunk)
        padded = n_chunks * chunk

        in_window, window_end = adapt.build_schedule(self.num_warmup)
        is_warmup = np.arange(padded) < self.num_warmup
        freeze = np.arange(padded) == (self.num_warmup - 1)
        in_win = np.zeros(padded, dtype=bool)
        in_win[:self.num_warmup] = np.asarray(in_window)
        win_end = np.zeros(padded, dtype=bool)
        win_end[:self.num_warmup] = np.asarray(window_end)
        flags = jnp.asarray(
            np.stack([is_warmup, in_win, win_end, freeze], axis=1))

        u0 = self.model.init_unconstrained()
        keys = random.split(rng_key, self.num_chains + 1)
        jitter = self.init_jitter * random.uniform(
            keys[0], (self.num_chains, u0.shape[0]), minval=-1.0, maxval=1.0)
        z0 = u0[None, :] + jitter

        chain_keys = keys[1:]
        if chain_sharding is not None:
            chain_keys = jax.device_put(chain_keys, chain_sharding)
            z0 = jax.device_put(z0, chain_sharding)

        init_fn = jax.jit(jax.vmap(self._init_chain))
        chunk_fn = jax.jit(jax.vmap(self._run_chunk, in_axes=(0, None)))

        state = init_fn(chain_keys, z0)
        outs = []
        start_chunk = 0
        if checkpoint_path is not None:
            resumed = self._load_run_checkpoint(checkpoint_path, state)
            if resumed is not None:
                state, outs, start_chunk = resumed
                if chain_sharding is not None:
                    # restored leaves land on default placement; re-apply the
                    # chain sharding so resumed runs stay SPMD over the mesh
                    state = jax.tree.map(
                        lambda l: jax.device_put(l, chain_sharding), state)
                if self.progress:
                    print(f"[mcmc] resumed at step {start_chunk * chunk}"
                          f"/{total} from {checkpoint_path}", flush=True)

        for c in range(start_chunk, n_chunks):
            fl = flags[c * chunk:(c + 1) * chunk]
            state, out = chunk_fn(
                state, (fl[:, 0], fl[:, 1], fl[:, 2], fl[:, 3]))
            outs.append(out)
            if checkpoint_path is not None:
                self._save_run_checkpoint(checkpoint_path, state, outs, c + 1)
            if self.progress:
                done = min((c + 1) * chunk, total)
                acc = float(jnp.mean(out[1]))
                print(f"[mcmc] step {done}/{total} "
                      f"({'warmup' if done <= self.num_warmup else 'sample'})"
                      f" accept={acc:.2f}", flush=True)

        # concat chunk outputs along the draw axis (axis 1: chains lead)
        zs, accept, div, steps, depth, pes = (
            jnp.concatenate([o[i] for o in outs], axis=1)[:, :total]
            for i in range(6))

        sel = slice(self.num_warmup + self.thinning - 1, None, self.thinning)
        zs, accept, div, steps, depth, pes = (
            a[:, sel] for a in (zs, accept, div, steps, depth, pes))

        self._samples_u = zs  # (chains, draws, zdim)
        self._extra = dict(accept_prob=accept, diverging=div,
                           num_steps=steps, tree_depth=depth,
                           potential_energy=pes,
                           step_size=state.step_size,
                           inv_mass=state.inv_mass)
        return self

    # --- in-flight run checkpointing ---
    def _ckpt_config(self):
        return np.array([self.num_warmup, self.num_samples, self.num_chains,
                         self.thinning, self.chunk_steps])

    @staticmethod
    def _chunk_path(path, c):
        return f"{path}.chunk_{c:05d}.npz"

    @staticmethod
    def _atomic_savez(path, payload):
        import os
        import tempfile

        # atomic replace so a mid-write kill cannot corrupt the checkpoint
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(path) or ".",
                                   suffix=".npz")
        with os.fdopen(fd, "wb") as f:
            np.savez(f, **payload)
        os.replace(tmp, path)

    def _save_run_checkpoint(self, path, state, outs, chunks_done):
        """Streaming checkpoint: O(1) host I/O per chunk.

        Each chunk's draws are written ONCE to a side file
        (``{path}.chunk_NNNNN.npz``); only the small chain-state file at
        ``path`` is atomically replaced every chunk.  (Round 2 re-serialized
        the full accumulated history per chunk - O(chunks^2) I/O over a
        long run.)
        """
        import os

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        # write any chunk files not yet on disk (normally exactly one)
        for c in range(chunks_done):
            cp = self._chunk_path(path, c)
            if not os.path.exists(cp):
                self._atomic_savez(
                    cp, {f"out_{i}": np.asarray(outs[c][i])
                         for i in range(6)})

        leaves = jax.tree_util.tree_leaves(state)
        payload = {"config": self._ckpt_config(),
                   "chunks_done": np.array(chunks_done)}
        for i, leaf in enumerate(leaves):
            payload[f"state_{i}"] = np.asarray(leaf)
        self._atomic_savez(path, payload)

    def _load_run_checkpoint(self, path, state_template):
        import os

        if not os.path.exists(path):
            return None
        data = np.load(path, allow_pickle=False)
        if not np.array_equal(data["config"], self._ckpt_config()):
            raise ValueError(
                f"checkpoint at {path} was written with a different MCMC "
                f"configuration: {data['config']} vs {self._ckpt_config()}")
        leaves, treedef = jax.tree_util.tree_flatten(state_template)
        new_leaves = [jnp.asarray(data[f"state_{i}"]).astype(l.dtype)
                      for i, l in enumerate(leaves)]
        state = jax.tree_util.tree_unflatten(treedef, new_leaves)
        outs = []
        for c in range(int(data["chunks_done"])):
            cp = self._chunk_path(path, c)
            if not os.path.exists(cp):
                raise ValueError(
                    f"checkpoint at {path} is missing its chunk file {cp}")
            cd = np.load(cp, allow_pickle=False)
            outs.append(tuple(jnp.asarray(cd[f"out_{i}"]) for i in range(6)))
        return state, outs, int(data["chunks_done"])

    # --- results ---
    def get_samples(self, group_by_chain: bool = False) -> dict:
        """Constrained-space samples per parameter name."""
        if self._samples_u is None:
            raise RuntimeError("call .run(key) first")
        u = self._samples_u
        if not group_by_chain:
            u = u.reshape(-1, u.shape[-1])
        # go through model.constrain so reparametrized models (NeuTra) map
        # their sampling space back to parameters correctly
        constrain = self.model.constrain
        for _ in range(u.ndim - 1):
            constrain = jax.vmap(constrain)
        return constrain(u)

    def get_extra_fields(self) -> dict:
        return self._extra

    @property
    def divergences(self):
        return int(np.asarray(self._extra["diverging"]).sum())

    def summary(self):
        from lqg_tpu.infer.diagnostics import summary as _summary
        return _summary(self.get_samples(group_by_chain=True))

    def print_summary(self):
        df = self.summary()
        print(df.to_string(float_format=lambda v: f"{v:8.3f}"))
        print(f"\ndivergences: {self.divergences}")
        return df
