"""Node ↔ dense trajectory conversion.

TPU-native equivalent of the external ``traj_sampling.spline.SplineBase``
(reference call surface: robot_traj_grad_sampling.py:148-170 node2u/u2node and
tests/score_sampling/cmp_mppi_wbfo.py:16 SplineBase).  Both directions are
precomputed dense matrices — a node→dense conversion for a whole sample batch
is one [Nsample·A, Hnode+1] × [Hnode+1, Hsample+1] matmul on the MXU instead
of the reference's per-segment spline evaluation.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..utils.math import spline_fit_matrix, spline_interp_matrix  # noqa: F401 (public API)


class TrajSpline:
    """Fixed-size node↔dense converter for one (Hnode, Hsample) pair."""

    def __init__(self, horizon_nodes: int, horizon_samples: int, method: str = "spline"):
        """``horizon_nodes``/``horizon_samples`` follow the reference convention:
        trajectories carry ``H+1`` points (node 0 = current step)."""
        self.horizon_nodes = horizon_nodes
        self.horizon_samples = horizon_samples
        self.method = method
        self.n_nodes = horizon_nodes + 1
        self.n_dense = horizon_samples + 1
        # host numpy: these are closure constants of jitted conversions —
        # device-resident versions would be read back (D2H) at jit lowering,
        # which poisons axon dispatch latency for the whole process
        import numpy as np

        from ..utils.math import _spline_interp_matrix_np

        self.A = _spline_interp_matrix_np(self.n_nodes, self.n_dense, method)  # [D, N]
        self.P = np.linalg.pinv(self.A).astype(np.float32)                     # [N, D]

    def node2dense(self, nodes: jnp.ndarray) -> jnp.ndarray:
        """[..., Hnode+1, A] → [..., Hsample+1, A]."""
        return jnp.einsum("dn,...na->...da", self.A, nodes)

    def dense2node(self, dense: jnp.ndarray) -> jnp.ndarray:
        """Least-squares fit [..., Hsample+1, A] → [..., Hnode+1, A]."""
        return jnp.einsum("nd,...da->...na", self.P, dense)

    # reference-compatible aliases (robot_traj_grad_sampling.py:148-170)
    node2u = node2dense
    u2node = dense2node
