"""hisat2_tpu.align"""
