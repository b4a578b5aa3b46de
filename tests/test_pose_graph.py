"""Sim3 pose-graph parity: the matrix-free CG solver (reference-scale
path) must match the dense Cholesky solver on a drifted-ring fixture."""

import jax.numpy as jnp
import numpy as np

from orbslam_mapsave_tpu.geometry import se3
from orbslam_mapsave_tpu.optim import pose_graph


def ring_problem(rng, K=48, drift=0.004):
    """K poses around a circle; edge measurements are TRUE relatives;
    initial poses accumulate odometry drift; one loop edge ties the ends.
    Minimizing the graph should pull the chain back to truth."""
    th = np.linspace(0, 2 * np.pi, K, endpoint=False)
    S_true = np.zeros((K, 4, 4), np.float32)
    for k in range(K):
        xi = np.array([np.cos(th[k]), np.sin(th[k]), 0.0,
                       0.0, 0.0, th[k]])
        S_true[k] = np.asarray(se3.se3_exp(jnp.asarray(xi, jnp.float32)))
    S0 = S_true.copy()
    acc = np.eye(4, dtype=np.float32)
    for k in range(1, K):
        xi = np.concatenate([rng.normal(size=3) * drift,
                             rng.normal(size=3) * drift]).astype(np.float32)
        acc = acc @ np.asarray(se3.se3_exp(jnp.asarray(xi)))
        S0[k] = S_true[k] @ acc
    ei, ej, meas = [], [], []
    for k in range(K):  # chain + skip-2 covis edges + ring-closing edge
        for d in (1, 2):
            j = k + d
            if j < K:
                ei.append(k); ej.append(j)
                meas.append(S_true[k] @ np.linalg.inv(S_true[j]))
    ei.append(0); ej.append(K - 1)
    meas.append(S_true[0] @ np.linalg.inv(S_true[K - 1]))
    E = len(ei)
    fixed = np.zeros(K, bool); fixed[0] = True
    return pose_graph.PoseGraphProblem(
        S_init=jnp.asarray(S0),
        fixed=jnp.asarray(fixed),
        valid=jnp.ones(K, bool),
        edge_i=jnp.asarray(ei, jnp.int32),
        edge_j=jnp.asarray(ej, jnp.int32),
        edge_meas=jnp.asarray(np.stack(meas), jnp.float32),
        edge_valid=jnp.ones(E, bool),
        edge_weight=jnp.ones(E, jnp.float32),
    ), S_true


def pose_err(S, S_true):
    errs = []
    for a, b in zip(np.asarray(S), S_true):
        errs.append(np.linalg.norm(np.asarray(
            se3.se3_log(jnp.asarray(np.linalg.inv(b) @ a)))))
    return float(np.mean(errs))


def test_pose_graph_cg_matches_dense(rng):
    prob, S_true = ring_problem(rng)
    err0 = pose_err(prob.S_init, S_true)
    Sd, chi_d = pose_graph.optimize_pose_graph(prob, n_iters=20,
                                               solver="dense")
    Sc, chi_c = pose_graph.optimize_pose_graph(prob, n_iters=20,
                                               solver="cg", cg_iters=150)
    err_d = pose_err(Sd, S_true)
    err_c = pose_err(Sc, S_true)
    assert err_d < err0 * 0.2, (err0, err_d)
    assert err_c < max(1.5 * err_d, 1e-4), (err_d, err_c)
    assert float(chi_c) < 1.1 * float(chi_d) + 1e-6, (chi_d, chi_c)
