"""Genomics format sources/sinks (SAM/BAM/VCF on BGZF; CRAM chunk-planned,
decode stubbed).  See each module's docstring for reference citations."""
