from .dtypes import Policy, DEFAULT_POLICY, BF16_POLICY
from .prng import seed_everything, key_iter
from .mesh import create_mesh, data_sharding, replicated_sharding
