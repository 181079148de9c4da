"""hisat2_tpu.parallel"""
