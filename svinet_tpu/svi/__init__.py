from svinet_tpu.svi.linksampling import LinkSampling

__all__ = ["LinkSampling"]
