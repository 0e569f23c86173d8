from .sampler import HardNegativeSampler, HardNegativeSamplerBase
