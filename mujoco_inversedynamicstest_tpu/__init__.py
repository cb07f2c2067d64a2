"""TPU-native rigid-body dynamics, inverse dynamics, and MPC framework.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of the
reference MuJoCo fork (``fancifulland2718/mujoco_InverseDynamicsTest``),
built TPU-first: immutable flat-SoA ``Model``/``Data`` pytrees, level-wise
vectorized tree dynamics, dense MXU-shaped linear algebra, static shapes
throughout, ``vmap`` batching and ``shard_map`` distribution.
"""

from mujoco_inversedynamicstest_tpu.models.io import (
    load_model,
    make_data,
    put_data,
    put_model,
)
from mujoco_inversedynamicstest_tpu.models.interop import (
    get_data,
    get_data_batch,
    id2name,
    name2id,
    nkey,
    reset_data_keyframe,
)
from mujoco_inversedynamicstest_tpu.models.types import (
    BiasType,
    ConeType,
    Contact,
    Data,
    DisableBit,
    DynType,
    EnableBit,
    EqType,
    GainType,
    GeomType,
    IntegratorType,
    JointType,
    Model,
    ObjType,
    Option,
    SensorType,
    SolverType,
    TrnType,
)
from mujoco_inversedynamicstest_tpu.ops import math
from mujoco_inversedynamicstest_tpu.ops import support
from mujoco_inversedynamicstest_tpu.ops.forward import (
    euler,
    forward,
    fwd_acceleration,
    fwd_actuation,
    fwd_position,
    fwd_velocity,
    rungekutta4,
    step,
    step_n,
)
from mujoco_inversedynamicstest_tpu.ops.inverse import (
    compare_fwd_inv,
    inverse,
)
from mujoco_inversedynamicstest_tpu.ops.passive import passive
from mujoco_inversedynamicstest_tpu import viewer
from mujoco_inversedynamicstest_tpu import renderer
from mujoco_inversedynamicstest_tpu.ops.smooth import (
    com_pos,
    com_vel,
    crb,
    factor_m,
    kinematics,
    mul_m,
    rne,
    solve_m,
    transmission,
)

__version__ = "0.1.0"
