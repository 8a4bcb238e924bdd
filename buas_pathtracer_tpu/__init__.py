"""buas_pathtracer_tpu — a TPU-native (JAX/XLA/Pallas) wavefront pathtracing
framework with the capabilities of TheSandvichMaker/BUAS-Pathtracer.

The reference is a CPU tile-based megakernel pathtracer (C++/SSE).  This
framework re-designs it TPU-first:

  * rays are SoA batches; every bounce is a batched pass (wavefront),
  * BVHs flatten to threaded (skip-link) node arrays traversed in lockstep,
  * tile multithreading becomes ``shard_map`` over a device mesh,
  * samplers/filters/post run as fused vector programs on the VPU.

Layout:
  core/         math (SoA Vec3, affine pairs), RNG, sampler strategies
  ops/          intersection, BVH build+traversal, filters, post, env maps
  models/       materials, cameras, scene API + packed scenes, descriptions
  integrators/  advanced, whitted, ground-truth, normals, distances
  parallel/     device-mesh sharding of the render loop
  runtime/      progressive renderer (accumulation, commit protocol), native helpers
  utils/        OBJ/HDR/BMP/PNG asset IO
"""

__version__ = "0.1.0"
