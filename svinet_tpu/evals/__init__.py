from svinet_tpu.evals.likelihood import heldout_stats, HeldoutResult
from svinet_tpu.evals.stopping import ValidationStop
from svinet_tpu.evals.nmi import overlapping_nmi

__all__ = ["heldout_stats", "HeldoutResult", "ValidationStop", "overlapping_nmi"]
