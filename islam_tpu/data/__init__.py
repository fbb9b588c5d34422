from islam_tpu.data.dataset import TrajFolderDataset
from islam_tpu.data.transforms import (Compose, CropCenter, DownscaleFlow,
                                       Normalize, ResizeData, ToNHWCTensor)
from islam_tpu.data.synthetic import SyntheticTrajDataset
