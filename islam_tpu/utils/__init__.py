from islam_tpu.utils.timer import Timer
