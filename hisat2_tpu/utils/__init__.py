"""hisat2_tpu.utils"""
