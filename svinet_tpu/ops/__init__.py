from svinet_tpu.ops.expectations import dirichlet_expectation, dirichlet_mean
from svinet_tpu.ops.edges import pad_edges

__all__ = ["dirichlet_expectation", "dirichlet_mean", "pad_edges"]
