from svinet_tpu.svi.linksampling import LinkSampling
from svinet_tpu.svi.mmsb import MMSBInfer
from svinet_tpu.svi.fastamm import FastAMM
from svinet_tpu.svi.fastamm2 import FastAMM2
from svinet_tpu.svi.fastinit import FastInit
from svinet_tpu.svi.sbm import SBM
from svinet_tpu.svi.orig import MMSBOrig
from svinet_tpu.svi.gen import MMSBGen

__all__ = ["LinkSampling", "MMSBInfer", "FastAMM", "FastAMM2", "FastInit",
           "SBM", "MMSBOrig", "MMSBGen"]
