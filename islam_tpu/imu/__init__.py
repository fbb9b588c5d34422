from islam_tpu.imu.preintegrator import preintegrate, IMUState
from islam_tpu.imu.module import IMUModule
