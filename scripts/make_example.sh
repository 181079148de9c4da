#!/bin/sh
# Builds the bundled example indexes (linear + SNP graph) from the
# reference's example data (equivalent of the prebuilt example/index).
EX=${1:-/root/reference/example}
python -m hisat2_tpu build "$EX/reference/22_20-21M.fa" 22_20-21M
python -m hisat2_tpu build "$EX/reference/22_20-21M.fa" 22_20-21M_snp \
    --snp "$EX/reference/22_20-21M.snp"
