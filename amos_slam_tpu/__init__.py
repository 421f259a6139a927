"""amos_slam_tpu: a TPU-native anti-dynamics RGB-D/stereo/monocular SLAM framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of Amos-SLAM
(an anti-dynamics two-stage SLAM system built on ORB-SLAM2; reference layout
surveyed in SURVEY.md). Nothing here is a port: per-frame computation is a
small set of jitted XLA programs over static padded shapes; the map is an
array-resident structure-of-arrays with functional snapshot semantics; the
reference's threads/mutexes (SURVEY.md section 2d) are replaced by JAX async
dispatch; multi-stream scale-out rides `jax.sharding.Mesh` over ICI.

Subpackages
-----------
geometry   SE3/Sim3 Lie groups, camera models, triangulation.
solvers    Batched Gauss-Newton/LM, pose optimization, local BA (Schur),
           pose-graph optimization, EPnP, Horn Sim3, monocular initializer.
ops        Image/feature kernels: pyramid, FAST, rBRIEF, LK flow, Hamming
           matching, RANSAC machinery, SLIC clustering (+ Pallas variants).
models     YOLACT instance segmentation (ResNet-FPN + ProtoNet) in JAX.
frontend   Frame construction, ORB extraction pipeline, matchers, the
           two-stage dynamic-rejection, the tracking state machine.
slam_map   Array-resident map, keyframes, covisibility, local mapping.
loop       Binary BoW vocabulary, keyframe database, loop closing.
io         Dataset loaders (TUM/KITTI/EuRoC), trajectory IO, ATE/RPE eval.
parallel   Device-mesh helpers and batched multi-stream SLAM.
"""

__version__ = "0.1.0"

# F32 matmul precision: on TPU, jax's DEFAULT matmul precision truncates
# f32 operands to bfloat16 on the MXU. For a SLAM system that is a
# correctness bug, not a tuning knob: pose composition (velocity @ Tcw),
# point transforms, and the pose-derived epipolar geometry F = K^-T E K^-1
# all run through small f32 matmuls, and bf16's 8 mantissa bits put
# pixel-level error into epipolar distances whose decision thresholds are
# 0.5-1 px (measured round 5: the two-stage tracker diverged to meter-ATE
# on the real-texture room on TPU while the bit-identical CPU run held
# 5 mm -- the feedback loop pose -> F -> suppression -> features -> pose
# amplifies the truncation). Ops that WANT reduced precision opt in
# explicitly (bf16 casts in the LK sampler, the YOLACT bf16 graph, int8
# Hamming); everything else gets exact f32.
# Override with JAX_DEFAULT_MATMUL_PRECISION before import if needed.
import os as _os

if "JAX_DEFAULT_MATMUL_PRECISION" not in _os.environ:
    import jax as _jax

    _jax.config.update("jax_default_matmul_precision", "highest")
