"""Core feed-forward modules (flax.linen).

Rebuild of the reference's net library (utils/net/common.py): ``MLP`` (:90,
miniblock norm/act composition :22), ``Net`` (:246, optional dueling :319 and
``num_atoms`` distributional heads), ``EnsembleLinear`` (:518, REDQ),
``BranchingNet`` (:553, BDQN).

TPU notes: all dense layers are MXU matmuls; keep batch and feature dims
>=128 where throughput matters. ``compute_dtype=bfloat16`` runs matmuls in
bf16 with fp32 params/outputs.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["MLP", "Net", "DuelingNet", "EnsembleLinear", "BranchingNet", "RandomActor", "DictObsNet", "flatten_dict_obs"]


class MLP(nn.Module):
    """Plain MLP: hidden_sizes with activation/norm after each hidden layer,
    optional linear output head (reference MLP, net/common.py:90)."""

    hidden_sizes: Sequence[int]
    output_dim: int = 0  # 0 -> last hidden layer is the output
    activation: Callable = nn.relu
    norm: str | None = None  # None | "layer"
    flatten_input: bool = True
    compute_dtype: Any = jnp.float32
    kernel_init: Callable | None = None  # None -> flax default (lecun_normal)

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.flatten_input and x.ndim > 2:
            x = x.reshape(x.shape[0], -1)
        x = x.astype(self.compute_dtype)
        kw = {} if self.kernel_init is None else {"kernel_init": self.kernel_init}
        for h in self.hidden_sizes:
            x = nn.Dense(h, dtype=self.compute_dtype, **kw)(x)
            if self.norm == "layer":
                x = nn.LayerNorm(dtype=self.compute_dtype)(x)
            x = self.activation(x)
        if self.output_dim > 0:
            x = nn.Dense(self.output_dim, dtype=self.compute_dtype, **kw)(x)
        return x.astype(jnp.float32)


class Net(nn.Module):
    """Feature/Q network over observations, optionally concatenated with
    actions (critic mode), with distributional atoms and softmax options
    (reference Net, net/common.py:246)."""

    hidden_sizes: Sequence[int]
    output_dim: int = 0
    num_atoms: int = 1
    softmax: bool = False
    concat_action: bool = False
    activation: Callable = nn.relu
    norm: str | None = None
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: jnp.ndarray, act: jnp.ndarray | None = None) -> jnp.ndarray:
        x = obs.reshape(obs.shape[0], -1)
        if self.concat_action and act is not None:
            x = jnp.concatenate([x, act.reshape(act.shape[0], -1)], axis=-1)
        out = self.output_dim * self.num_atoms
        x = MLP(
            self.hidden_sizes,
            out,
            activation=self.activation,
            norm=self.norm,
            compute_dtype=self.compute_dtype,
        )(x)
        if self.num_atoms > 1:
            x = x.reshape(x.shape[0], self.output_dim, self.num_atoms)
        if self.softmax:
            x = nn.softmax(x, axis=-1)
        return x


class DuelingNet(nn.Module):
    """Dueling Q head: Q = V + A - mean(A) (reference net/common.py:319)."""

    hidden_sizes: Sequence[int]
    action_dim: int
    num_atoms: int = 1
    dueling_hidden: Sequence[int] = (128,)
    activation: Callable = nn.relu
    compute_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> jnp.ndarray:
        feat = MLP(self.hidden_sizes, activation=self.activation, compute_dtype=self.compute_dtype)(obs)
        adv = MLP(self.dueling_hidden, self.action_dim * self.num_atoms, compute_dtype=self.compute_dtype)(feat)
        val = MLP(self.dueling_hidden, self.num_atoms, compute_dtype=self.compute_dtype)(feat)
        if self.num_atoms > 1:
            adv = adv.reshape(-1, self.action_dim, self.num_atoms)
            val = val.reshape(-1, 1, self.num_atoms)
        else:
            val = val  # [B,1]
            adv = adv  # [B,A]
        return val + adv - adv.mean(axis=1, keepdims=True)


class EnsembleLinear(nn.Module):
    """K independent linear layers applied in one batched matmul
    (reference EnsembleLinear net/common.py:518, used by REDQ).

    Input [K, B, I] (or [B, I] broadcast to all members) -> [K, B, O].
    One einsum keeps all K members on the MXU simultaneously.
    """

    ensemble_size: int
    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim == 2:
            x = jnp.broadcast_to(x, (self.ensemble_size,) + x.shape)
        k, _, i = x.shape
        w = self.param("kernel", nn.initializers.lecun_normal(), (k, i, self.features))
        b = self.param("bias", nn.initializers.zeros, (k, 1, self.features))
        return jnp.einsum("kbi,kio->kbo", x, w) + b


class BranchingNet(nn.Module):
    """Branching dueling Q-network (reference BranchingNet net/common.py:553,
    used by BDQN): shared trunk, one value head, per-branch advantage heads
    computed as a single ensemble matmul."""

    hidden_sizes: Sequence[int]
    num_branches: int
    action_per_branch: int
    value_hidden: Sequence[int] = (128,)
    branch_hidden: int = 128

    @nn.compact
    def __call__(self, obs: jnp.ndarray) -> jnp.ndarray:
        feat = MLP(self.hidden_sizes)(obs)
        val = MLP(self.value_hidden, 1)(feat)  # [B, 1]
        h = EnsembleLinear(self.num_branches, self.branch_hidden)(feat)
        h = nn.relu(h)
        adv = EnsembleLinear(self.num_branches, self.action_per_branch)(h)  # [K,B,A]
        adv = adv.transpose(1, 0, 2)  # [B, K, A]
        q = val[:, :, None] + adv - adv.mean(axis=-1, keepdims=True)
        return q  # [B, num_branches, action_per_branch]


class RandomActor(nn.Module):
    """Uniform-random "actor" (reference net/common.py:746): returns flat
    logits (discrete) or zero mean / unit sigma (continuous), giving a
    uniform / standard-normal action distribution regardless of obs. Used
    as the baseline module in builders that need a policy-shaped net."""

    action_dim: int
    discrete: bool = True

    @nn.compact
    def __call__(self, obs: jnp.ndarray):
        B = obs.shape[0]
        if self.discrete:
            return jnp.zeros((B, self.action_dim))  # uniform logits
        return jnp.zeros((B, self.action_dim)), jnp.ones((B, self.action_dim))


def flatten_dict_obs(obs) -> jnp.ndarray:
    """Flatten a dict/Batch observation into one feature vector per row —
    the analogue of the reference's ``get_dict_state_decorator``
    (net/common.py:677). Leaves are raveled per-sample and concatenated in
    sorted-key order (deterministic across calls); works under jit/vmap."""
    import jax

    leaves_with_paths = sorted(
        jax.tree_util.tree_flatten_with_path(obs)[0], key=lambda kv: str(kv[0])
    )
    arrs = [v.reshape(v.shape[0], -1) for _, v in leaves_with_paths]
    return jnp.concatenate(arrs, axis=-1)


class DictObsNet(nn.Module):
    """Wrap any obs->out module to accept dict/Batch observations by
    flattening them first (reference get_dict_state_decorator)."""

    net: nn.Module

    def __call__(self, obs, *args, **kwargs):
        if not isinstance(obs, jnp.ndarray):
            obs = flatten_dict_obs(obs)
        return self.net(obs, *args, **kwargs)
