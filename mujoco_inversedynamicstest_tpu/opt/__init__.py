"""Trajectory optimization / MPC layer (derivatives, QPs, iLQR, MPC)."""

from mujoco_inversedynamicstest_tpu.opt.derivative import (
    InverseJac,
    Transition,
    apply_tangent,
    inverse_ad,
    inverse_fd,
    measure_tangent,
    smooth_vel_deriv,
    state_dim,
    transition_ad,
    transition_fd,
)
from mujoco_inversedynamicstest_tpu.opt.ilqr import (
    ILQRConfig,
    ILQRResult,
    State,
    ilqr,
    lqr_gain,
    rollout_open_loop,
)
from mujoco_inversedynamicstest_tpu.opt.mpc import (
    MPCCarry,
    MPCConfig,
    MPCRun,
    MPCStepResult,
    inverse_torques,
    make_warm_start,
    mpc_step,
    run_mpc,
)
from mujoco_inversedynamicstest_tpu.opt.northstar import (
    NorthStarConfig,
    NorthStarResult,
    balance_cost,
    executed_trajectory,
    fleet_mpc_fn,
    inverse_torques_along,
    make_fleet,
    measure_solves_per_sec,
    torque_parity_vs_host,
)
from mujoco_inversedynamicstest_tpu.opt.minimize import (
    LeastSquaresResult,
    least_squares,
)
from mujoco_inversedynamicstest_tpu.opt.rollout import (
    RolloutResult,
    rollout,
)
from mujoco_inversedynamicstest_tpu.opt.qp import (
    BoxQPResult,
    band_to_dense,
    box_qp,
    chol_factor_band,
    chol_solve_band,
    dense_to_band,
)
