"""pcc_geo_cnn_v2_tpu — TPU-native learned point cloud geometry codec.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
mauriceqch/pcc_geo_cnn_v2 ("Improved Deep Point Cloud Geometry Compression",
arXiv:2006.09043): octree-partitioned voxel blocks pushed through 3D
convolutional autoencoders with factorized-prior (v1) or scale-hyperprior (v2)
entropy models, range-coded into compact bitstreams, with per-block adaptive
threshold selection optimized for D1/D2 distortion.

Unlike the TF1/CUDA reference, blocks are batched through jitted XLA
computations and sharded across TPU chips via `jax.sharding`; sequential
arithmetic coding runs in a host-side C++ range coder.

Subpackages
-----------
- ``models``   — flax transforms, entropy models, compression models, configs
- ``ops``      — device-side ops: voxelization, EDT, threshold sweep, focal loss
- ``coding``   — range coder (C++/numpy), CDF quantization, bitstream syntax
- ``parallel`` — device mesh / sharding helpers
- ``utils``    — host-side: octree partition, PLY IO, metrics, BD stats
- ``cli``      — command-line entry points mirroring the reference's scripts
"""

__version__ = "0.1.0"
