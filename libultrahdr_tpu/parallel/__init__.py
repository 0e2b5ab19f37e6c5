"""Multi-chip scaling layer: batch data-parallelism and spatial sharding.

The reference's whole concurrency model is a 4-thread row work-queue
(/root/reference/lib/src/jpegr.cpp:68-133,732).  The TPU-native equivalents:

* one fused XLA program per image (kernels.py / ops/*) — replaces the
  row-sharded pixel loops outright;
* `jax.vmap` over image batches on one chip — replaces "more threads";
* `shard_map` over a `jax.sharding.Mesh` with a ("data", "spatial") axis
  layout — batch DP across chips for throughput, spatial row-sharding for
  single-huge-image latency, with `lax.pmin/pmax` standing in for the
  reference's mutex-guarded min/max reduction (jpegr.cpp:838-931).
"""

from .batch import (encode_core_p010, encode_core_p010_twopass,  # noqa: F401
                    encode_batch_p010, make_mesh, sharded_encode_step,
                    sharded_apply_step)
