from islam_tpu.models.vonet import VONet
from islam_tpu.models.voflownet import VOFlowRes
from islam_tpu.models.pwcnet import PWCDCNet
from islam_tpu.models.stereonet import StereoNet7
