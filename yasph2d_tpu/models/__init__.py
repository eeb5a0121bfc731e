"""yasph2d_tpu.models"""
