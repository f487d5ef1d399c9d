from .build import (
    FMIndexData,
    PackedReference,
    build_fmindex,
    build_index_files,
    load_index,
    pack_reference,
    parse_fasta,
    save_index,
    suffix_array,
    unpack_2bit,
)
from .fmindex import FMIndex

__all__ = [
    "FMIndex",
    "FMIndexData",
    "PackedReference",
    "build_fmindex",
    "build_index_files",
    "load_index",
    "pack_reference",
    "parse_fasta",
    "save_index",
    "suffix_array",
    "unpack_2bit",
]
