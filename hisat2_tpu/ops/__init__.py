"""hisat2_tpu.ops"""
