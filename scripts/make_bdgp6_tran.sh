#!/bin/sh
# bdgp6_tran: download + build recipe (TPU-native counterpart of
# /root/reference/scripts/make_bdgp6_tran.sh — same data sources, our builder).
# Requires network access; run in an empty working directory.
set -e
fetch() {
    f=$(basename "$1")
    [ -f "$f" ] || wget -O "$f" "$1" || curl -o "$f" "$1"
}

fetch "ftp://ftp.ensembl.org/pub/release-84/fasta/drosophila_melanogaster/dna/Drosophila_melanogaster.BDGP6.dna.toplevel.fa.gz"
fetch "ftp://ftp.ensembl.org/pub/release-84/gtf/drosophila_melanogaster/Drosophila_melanogaster.BDGP6.84.gtf.gz"

rm -f genome.fa
gzip -cd Drosophila_melanogaster.BDGP6.dna.toplevel.fa.gz >> genome.fa
gzip -cd Drosophila_melanogaster.BDGP6.84.gtf.gz > genome.gtf
python -m hisat2_tpu extract-splice-sites genome.gtf > genome.ss
python -m hisat2_tpu extract-exons genome.gtf > genome.exon
python -m hisat2_tpu build genome.fa genome_tran --ss genome.ss --exon genome.exon
echo "genome_tran index built"
