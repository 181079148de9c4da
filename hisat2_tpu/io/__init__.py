"""hisat2_tpu.io"""
