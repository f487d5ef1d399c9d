from . import bam, bgzf, fastq, preprocess, standardize
from .bam import BAMWriter, BAMWriters, build_header_text, encode_alignment
from .fastq import FastQReader, iter_barcode_sets, parse_header
from .preprocess import barcode_sort
from .standardize import detect_format, standardize

__all__ = [
    "BAMWriter",
    "BAMWriters",
    "FastQReader",
    "bam",
    "barcode_sort",
    "bgzf",
    "build_header_text",
    "detect_format",
    "encode_alignment",
    "fastq",
    "iter_barcode_sets",
    "parse_header",
    "preprocess",
    "standardize",
]
