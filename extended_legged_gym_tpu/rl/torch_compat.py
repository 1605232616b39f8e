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


def load_reference_policy(path: str, num_obs: int, num_actions: int,
                          hidden_dims: Sequence[int] = (128, 64, 32),
                          activation: str = "elu"):
    """Convenience: build the flax ActorCritic matching an rsl_rl checkpoint
    and return (network, params, inference_fn)."""
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

    return net, params, policy
