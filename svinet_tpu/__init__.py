"""svinet-tpu: TPU-native stochastic variational inference for the
(assortative) mixed-membership stochastic blockmodel.

A brand-new JAX/XLA/Pallas framework with the capabilities of
premgopalan/svinet (overlapping community detection on undirected networks),
re-designed TPU-first: dense vectorized per-edge local steps, segment-sum
scatter of sufficient statistics, pjit/shard_map data parallelism over edge
shards with psum-reduced statistics, and Pallas kernels for the hot ops.
"""

__version__ = "0.1.0"

from svinet_tpu.config import Config
from svinet_tpu.graph import Network

__all__ = ["Config", "Network", "__version__"]
