"""yasph2d_tpu.render"""
