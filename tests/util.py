from vframe_ray.config import EngineConfig, IndexConfig

# small block size + several segments so block skipping, partial blocks and
# the distributed merge are all exercised even at fixture scale
SMALL_CFG = EngineConfig(index=IndexConfig(num_segments=5, block_size=32))
