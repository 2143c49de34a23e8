from genefaceplusplus_tpu.parallel.mesh import (
    make_mesh,
    ray_sharding,
    replicated,
    shard_rays,
)

__all__ = ["make_mesh", "ray_sharding", "replicated", "shard_rays"]
