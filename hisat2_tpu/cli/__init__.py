"""hisat2_tpu.cli"""
