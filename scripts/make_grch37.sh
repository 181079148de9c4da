#!/bin/sh
# grch37: download + build recipe (TPU-native counterpart of
# /root/reference/scripts/make_grch37.sh — same data sources, our builder).
# Requires network access; run in an empty working directory.
set -e
fetch() {
    f=$(basename "$1")
    [ -f "$f" ] || wget -O "$f" "$1" || curl -o "$f" "$1"
}

fetch "ftp://ftp.ensembl.org/pub/release-75/fasta/homo_sapiens/dna/Homo_sapiens.GRCh37.75.dna.primary_assembly.fa.gz"

rm -f genome.fa
gzip -cd Homo_sapiens.GRCh37.75.dna.primary_assembly.fa.gz >> genome.fa
python -m hisat2_tpu build genome.fa genome 
echo "genome index built"
