"""yasph2d_tpu.parallel"""
