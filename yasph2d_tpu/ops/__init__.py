"""yasph2d_tpu.ops"""
