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
