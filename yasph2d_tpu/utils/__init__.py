"""yasph2d_tpu.utils"""
