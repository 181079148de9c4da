"""hisat2_tpu.index"""
