"""Inline MJCF test models (written for this project; no reference assets).

Each model targets a particular code path, mirroring the reference's
tiny-inline-MJCF test pattern (reference ``test/engine/*_test.cc``).
"""

PENDULUM = """
<mujoco>
  <option timestep="0.002" gravity="0 0 -9.81"/>
  <worldbody>
    <body pos="0.1 0 0.5">
      <joint type="hinge" axis="0 1 0" pos="0 0 0.15" damping="0.05"/>
      <geom type="capsule" size="0.02" fromto="0 0 0.15 0 0 -0.15" mass="1.2"/>
    </body>
  </worldbody>
</mujoco>
"""

NLINK = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 1">
      <joint type="hinge" axis="0 1 0" stiffness="2.0" damping="0.1"/>
      <geom type="capsule" size="0.02" fromto="0 0 0 0.2 0 0" mass="0.7"/>
      <body pos="0.2 0 0" quat="0.96 0 0.28 0">
        <joint type="hinge" axis="1 0 0" pos="0.02 0 0"/>
        <geom type="capsule" size="0.02" fromto="0 0 0 0.2 0 0" mass="0.4"/>
        <body pos="0.2 0 0">
          <joint type="slide" axis="0 0 1" stiffness="11.0"/>
          <geom type="box" size="0.04 0.03 0.02" mass="0.2"/>
        </body>
      </body>
      <body pos="-0.1 0.1 0">
        <joint type="ball" pos="0 0 0.05" damping="0.02"/>
        <geom type="capsule" size="0.015" fromto="0 0 0 0 0.15 0" mass="0.3"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""

FREEBODY = """
<mujoco>
  <option timestep="0.002"/>
  <worldbody>
    <body pos="0 0 1">
      <freejoint/>
      <geom type="box" size="0.05 0.04 0.03" mass="0.5" pos="0.01 0 0.02"/>
      <body pos="0.08 0 0">
        <joint type="hinge" axis="0 0 1"/>
        <geom type="capsule" size="0.01" fromto="0 0 0 0.1 0 0" mass="0.1"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""

MULTIJOINT = """
<mujoco>
  <worldbody>
    <body pos="0.05 0 0.6" quat="0.98 0.14 0 0.14">
      <joint type="hinge" axis="0 1 0" pos="0 0 0.1"/>
      <joint type="hinge" axis="1 0 0" pos="0 0 0.1"/>
      <joint type="slide" axis="0 0 1"/>
      <geom type="capsule" size="0.02" fromto="0 0 0.1 0 0 -0.1" mass="0.8"/>
      <body pos="0 0 -0.12">
        <joint type="ball" damping="0.01"/>
        <geom type="sphere" size="0.03" mass="0.2" pos="0 0 -0.05"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""

ACTUATED = """
<mujoco>
  <option timestep="0.002">
    <flag contact="disable"/>
  </option>
  <worldbody>
    <body pos="0 0 1">
      <joint name="j0" type="hinge" axis="0 1 0" stiffness="3" damping="0.2"/>
      <geom type="capsule" size="0.02" fromto="0 0 0 0.25 0 0" mass="0.6"/>
      <body pos="0.25 0 0">
        <joint name="j1" type="hinge" axis="1 0 0" damping="0.05"/>
        <geom type="capsule" size="0.02" fromto="0 0 0 0.2 0 0" mass="0.4"/>
        <body pos="0.2 0 0">
          <joint name="j2" type="slide" axis="0 0 1" stiffness="8"/>
          <geom type="box" size="0.03 0.03 0.03" mass="0.2"/>
        </body>
      </body>
    </body>
    <body pos="0.5 0.5 1">
      <joint name="jb" type="ball" damping="0.01"/>
      <geom type="capsule" size="0.015" fromto="0 0 0 0 0 -0.2" mass="0.3"/>
    </body>
  </worldbody>
  <actuator>
    <motor joint="j0" gear="1.5" ctrlrange="-2 2"/>
    <position joint="j1" kp="10" ctrlrange="-1 1"/>
    <velocity joint="j2" kv="2"/>
    <general joint="j0" dyntype="filter" dynprm="0.05" gainprm="3.0"
             biastype="affine" biasprm="0 -0.5 -0.1"/>
    <general joint="jb" gear="0.5 0.3 0.1"/>
  </actuator>
</mujoco>
"""

GRAVCOMP = """
<mujoco>
  <option timestep="0.002">
    <flag contact="disable"/>
  </option>
  <worldbody>
    <body pos="0 0 1" gravcomp="0.8">
      <joint type="hinge" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" size="0.02" fromto="0 0 0 0.3 0 0" mass="0.5"/>
      <body pos="0.3 0 0" gravcomp="1.0">
        <joint type="ball"/>
        <geom type="sphere" size="0.04" mass="0.2" pos="0 0 -0.06"/>
      </body>
    </body>
    <body pos="1 0 1" gravcomp="0.5">
      <freejoint/>
      <geom type="box" size="0.04 0.04 0.04" mass="0.3"/>
    </body>
  </worldbody>
</mujoco>
"""

NLINK_NOCON = NLINK.replace(
    "<option timestep=\"0.002\"/>",
    "<option timestep=\"0.002\"><flag contact=\"disable\"/></option>",
)
FREEBODY_NOCON = FREEBODY.replace(
    "<option timestep=\"0.002\"/>",
    "<option timestep=\"0.002\"><flag contact=\"disable\"/></option>",
)

SLIDER_CRANK = """
<mujoco>
  <option timestep="0.002">
    <flag contact="disable"/>
  </option>
  <worldbody>
    <body name="crank" pos="0 0 0.5">
      <joint name="rot" type="hinge" axis="0 1 0" damping="0.02"/>
      <geom type="capsule" size="0.015" fromto="0 0 0 0.1 0 0" mass="0.3"/>
      <body name="rod" pos="0.1 0 0">
        <joint type="hinge" axis="0 1 0"/>
        <geom type="capsule" size="0.01" fromto="0 0 0 0.25 0 0" mass="0.15"/>
        <site name="rodtip" pos="0.25 0 0"/>
      </body>
    </body>
    <body name="slider" pos="0.35 0 0.5">
      <joint name="slide" type="slide" axis="1 0 0" damping="0.1"/>
      <geom type="box" size="0.03 0.02 0.02" mass="0.2"/>
      <site name="slidesite" pos="0 0 0"/>
    </body>
  </worldbody>
  <equality>
    <connect site1="rodtip" site2="slidesite"/>
  </equality>
  <actuator>
    <motor joint="rot" gear="1"/>
  </actuator>
</mujoco>
"""

EQ_JOINT = """
<mujoco>
  <option timestep="0.002"><flag contact="disable"/></option>
  <worldbody>
    <body pos="0 0 0.5">
      <joint name="a" type="hinge" axis="0 1 0" damping="0.05"/>
      <geom type="capsule" size="0.02" fromto="0 0 0 0.2 0 0" mass="0.4"/>
      <body pos="0.2 0 0">
        <joint name="b" type="hinge" axis="0 1 0" damping="0.05"/>
        <geom type="capsule" size="0.02" fromto="0 0 0 0.2 0 0" mass="0.3"/>
      </body>
    </body>
  </worldbody>
  <equality>
    <joint joint1="b" joint2="a" polycoef="0.1 0.5 0.2 0 0"/>
  </equality>
</mujoco>
"""

WELD_EQ = """
<mujoco>
  <option timestep="0.002"><flag contact="disable"/></option>
  <worldbody>
    <body name="b1" pos="0 0 0.5">
      <joint type="hinge" axis="0 1 0" damping="0.1"/>
      <geom type="capsule" size="0.02" fromto="0 0 0 0.2 0 0" mass="0.4"/>
    </body>
    <body name="b2" pos="0.3 0 0.5">
      <joint type="ball" damping="0.05"/>
      <joint type="slide" axis="1 0 0" damping="0.05"/>
      <geom type="box" size="0.03 0.03 0.03" mass="0.3"/>
    </body>
  </worldbody>
  <equality>
    <weld body1="b1" body2="b2" torquescale="0.7"/>
  </equality>
</mujoco>
"""

LIMITED = """
<mujoco>
  <option timestep="0.002"><flag contact="disable"/></option>
  <worldbody>
    <body pos="0 0 0.6">
      <joint name="h" type="hinge" axis="0 1 0" range="-25 35" margin="0.01"
             damping="0.02"/>
      <geom type="capsule" size="0.02" fromto="0 0 0 0.25 0 0" mass="0.5"/>
      <body pos="0.25 0 0">
        <joint name="s" type="slide" axis="0 0 1" range="-0.08 0.12"/>
        <geom type="box" size="0.03 0.03 0.03" mass="0.2"/>
      </body>
      <body pos="-0.15 0 0">
        <joint name="bl" type="ball" range="0 40"/>
        <geom type="capsule" size="0.015" fromto="0 0 0 0 0 -0.15" mass="0.25"/>
      </body>
    </body>
  </worldbody>
  <actuator><motor joint="h" gear="1"/></actuator>
</mujoco>
"""

FRICTIONLOSS = """
<mujoco>
  <option timestep="0.002"><flag contact="disable"/></option>
  <worldbody>
    <body pos="0 0 0.5">
      <joint type="hinge" axis="0 1 0" frictionloss="0.4" damping="0.01"/>
      <geom type="capsule" size="0.02" fromto="0 0 0 0.25 0 0" mass="0.5"/>
      <body pos="0.25 0 0">
        <joint type="slide" axis="1 0 0" frictionloss="0.2" stiffness="5"/>
        <geom type="box" size="0.03 0.03 0.03" mass="0.2"/>
      </body>
    </body>
  </worldbody>
</mujoco>
"""

ALL_CONSTRAINED = {
    "slider_crank": SLIDER_CRANK,
    "eq_joint": EQ_JOINT,
    "weld": WELD_EQ,
    "limited": LIMITED,
    "frictionloss": FRICTIONLOSS,
}

ALL_SMOOTH = {
    "pendulum": PENDULUM,
    "nlink": NLINK_NOCON,
    "freebody": FREEBODY,
    "multijoint": MULTIJOINT,
}

ALL_STEPPABLE = {
    "pendulum": PENDULUM,
    "nlink": NLINK_NOCON,
    "freebody": FREEBODY_NOCON,
    "actuated": ACTUATED,
    "gravcomp": GRAVCOMP,
}
