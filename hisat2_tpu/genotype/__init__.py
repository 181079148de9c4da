"""HISAT-genotype equivalent: allele typing from read alignments.

Reference: /root/reference/hisatgenotype.py (driver: align -> extract
per-locus reads -> typing) and hisatgenotype_locus.py /
hisatgenotype_modules/hisatgenotype_typing_common.py (compatibility-class
EM with SQUAREM acceleration).
"""
