from islam_tpu.pvgo.graph import pvgo_residuals, vo_loss, imu_loss, align_to
from islam_tpu.pvgo.run import run_pvgo
