"""rsl_rl torch checkpoint interop.

Loads the reference's ActorCritic ``.pt`` checkpoints (e.g. the shipped
behavior baselines ckpt/anymal_c/plane_walk_200.pt,
ckpt/elspider_air/plane_walk_300.pt — reference on_policy_runner.py:662-715
save format) into this framework's flax ActorCritic parameters, used for
MPC RL warm-start (robot_traj_grad_sampling_config.py rl_warmstart section)
and behavior-parity evaluation."""
from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def load_rsl_rl_checkpoint(path: str):
    """Read an rsl_rl .pt checkpoint (host-side torch CPU) → numpy state dict."""
    import torch

    d = torch.load(path, map_location="cpu", weights_only=False)
    sd = d.get("model_state_dict", d)
    return {k: v.detach().numpy() for k, v in sd.items()}, d.get("iter", None)


def torch_actor_critic_to_flax(sd: Dict[str, np.ndarray],
                               flax_params: dict) -> dict:
    """Map torch Sequential actor/critic weights into our flax ActorCritic
    params (MLP Dense_i ← torch layer 2i; torch stores [out, in], flax
    [in, out]).  ``flax_params`` provides the target structure (from
    network.init) so shapes are checked."""
    import jax

    out = jax.tree.map(lambda x: x, flax_params)  # fresh dict structure
    params = out["params"]

    def fill(prefix: str, dst: dict):
        torch_idx = [int(k.split(".")[1]) for k in sd if k.startswith(prefix + ".")
                     and k.endswith(".weight")]
        for di, ti in enumerate(sorted(set(torch_idx))):
            w = sd[f"{prefix}.{ti}.weight"].T
            b = sd[f"{prefix}.{ti}.bias"]
            tgt = dst[f"Dense_{di}"]
            assert tgt["kernel"].shape == w.shape, (prefix, di, tgt["kernel"].shape, w.shape)
            tgt["kernel"] = jnp.asarray(w)
            tgt["bias"] = jnp.asarray(b)

    fill("actor", params["actor"])
    fill("critic", params["critic"])
    if "std" in sd:
        params["log_std"] = jnp.log(jnp.clip(jnp.asarray(sd["std"]), 1e-6))
    return out


def dof_permutation(our_joint_names: Sequence[str],
                    ref_joint_names: Sequence[str] | None = None):
    """(perm, inv) mapping between OUR engine's DOF order and the Isaac Gym
    DOF order a reference checkpoint was trained with.

    ``perm[i]`` = our index of the joint at reference position i, so
    ``x_ref = x_ours[perm]`` and ``a_ours = a_ref[inv]``.

    ``ref_joint_names`` defaults to ``sorted(our_joint_names)``: Isaac Gym's
    asset DOF order for the reference URDFs is alphabetical by joint name —
    verified empirically by a permutation sweep replaying plane_walk_200.pt
    through this engine (alphabetical: 94% tracking, zero falls; our URDF
    traversal order: 77% with falls — the policy was driving a leg-permuted
    robot, the dominant r1-r3 parity gap)."""
    import numpy as np

    ours = list(our_joint_names)
    ref = sorted(ours) if ref_joint_names is None else list(ref_joint_names)
    if sorted(ours) != sorted(ref):
        raise ValueError(f"joint name mismatch: {ours} vs {ref}")
    perm = np.asarray([ours.index(n) for n in ref])
    return perm, np.argsort(perm)


def permuted_policy(policy, our_joint_names: Sequence[str],
                    ref_joint_names: Sequence[str] | None = None,
                    dof_obs_start: int = 12):
    """Wrap a reference-checkpoint policy so it sees observations and emits
    actions in ITS training-time DOF order while the env speaks ours.

    Assumes the canonical LeggedRobot obs layout (legged_robot.py:234-252):
    [lin vel 3, ang vel 3, gravity 3, commands 3, dof_pos nj, dof_vel nj,
    actions nj, <rest>] — only the three nj-segments are permuted."""
    perm, inv = dof_permutation(our_joint_names, ref_joint_names)
    if (perm == inv).all() and (perm == range(len(perm))).all():
        return policy
    nj = len(perm)
    s0 = dof_obs_start
    P = jnp.asarray(perm)
    I = jnp.asarray(inv)

    def wrapped(obs):
        head = obs[:, :s0]
        dof_p = obs[:, s0:s0 + nj][:, P]
        dof_v = obs[:, s0 + nj:s0 + 2 * nj][:, P]
        act = obs[:, s0 + 2 * nj:s0 + 3 * nj][:, P]
        rest = obs[:, s0 + 3 * nj:]
        a_ref = policy(jnp.concatenate([head, dof_p, dof_v, act, rest], -1))
        return a_ref[:, I]

    return wrapped


def permute_params_to_our_dof_order(params: dict,
                                    our_joint_names: Sequence[str],
                                    ref_joint_names: Sequence[str] | None = None,
                                    dof_obs_start: int = 12) -> dict:
    """Bake the DOF-order bridge into the WEIGHTS: returns ActorCritic params
    that speak this engine's joint order natively (input-layer rows of the
    three nj-wide obs segments and the actor output layer / log_std are
    permuted).  Exactly equivalent to wrapping with ``permuted_policy`` —
    pinned by tests/test_warmstart.py — but usable as a PPO init for
    finetuning (VERDICT r4 next #1's reference-warm-start diagnostic).

    Assumes the canonical LeggedRobot obs layout (legged_robot.py:234-252)
    for BOTH actor and critic inputs (flat task: critic obs == obs)."""
    import jax

    perm, inv = dof_permutation(our_joint_names, ref_joint_names)
    nj = len(perm)
    s0 = dof_obs_start
    out = jax.tree.map(lambda x: x, params)
    p = out["params"]

    def perm_in(k):
        # ref net reads obs_ref[base+i] = obs_ours[base+perm[i]] per segment →
        # the our-native kernel row base+perm[i] must carry ref row base+i
        k = np.asarray(k).copy()
        for seg in range(3):
            base = s0 + seg * nj
            src = k[base:base + nj].copy()
            k[base + perm] = src
        return jnp.asarray(k)

    p["actor"]["Dense_0"]["kernel"] = perm_in(p["actor"]["Dense_0"]["kernel"])
    p["critic"]["Dense_0"]["kernel"] = perm_in(p["critic"]["Dense_0"]["kernel"])
    n_out = max(int(i.split("_")[1]) for i in p["actor"] if i.startswith("Dense_"))
    last = p["actor"][f"Dense_{n_out}"]
    last["kernel"] = jnp.asarray(np.asarray(last["kernel"])[:, inv])
    last["bias"] = jnp.asarray(np.asarray(last["bias"])[inv])
    if "log_std" in p:
        p["log_std"] = jnp.asarray(np.asarray(p["log_std"])[inv])
    return out


def load_reference_policy(path: str, num_obs: int, num_actions: int,
                          hidden_dims: Sequence[int] = (128, 64, 32),
                          activation: str = "elu",
                          our_joint_names: Sequence[str] | None = None,
                          ref_joint_names: Sequence[str] | None = None):
    """Convenience: build the flax ActorCritic matching an rsl_rl checkpoint
    and return (network, params, inference_fn).

    Pass ``our_joint_names`` (env.model.joint_names) to bridge the DOF-order
    gap between this engine and the Isaac Gym sim the checkpoint was trained
    in — see ``dof_permutation``.  Without it the raw policy is returned and
    the caller inherits the reference's alphabetical DOF convention."""
    import jax

    from ..models.networks import ActorCritic

    net = ActorCritic(num_actions=num_actions, actor_hidden_dims=tuple(hidden_dims),
                      critic_hidden_dims=tuple(hidden_dims), activation=activation)
    params0 = net.init(jax.random.PRNGKey(0), jnp.zeros((1, num_obs)),
                       jnp.zeros((1, num_obs)))
    sd, _ = load_rsl_rl_checkpoint(path)
    params = torch_actor_critic_to_flax(sd, params0)

    def policy(obs):
        return net.apply(params, obs, method=net.act_inference)

    if our_joint_names is not None:
        policy = permuted_policy(policy, our_joint_names, ref_joint_names)
    return net, params, policy
