from . import chain, cigar, extend, ksw, pairing, pipeline, smem
from .chain import Chain, Seed, chain_filter, mem_chain
from .cigar import MemAln, gen_cigar, reg2aln
from .extend import AlnReg, chain2aln, mark_primary, sort_dedup_patch
from .pipeline import EasyAlignment, align_pair_with_rescue, align_single, seq_to_codes
from .smem import SMEM, collect_seeds

__all__ = [
    "AlnReg",
    "Chain",
    "EasyAlignment",
    "MemAln",
    "SMEM",
    "Seed",
    "align_pair_with_rescue",
    "align_single",
    "chain",
    "chain2aln",
    "chain_filter",
    "cigar",
    "collect_seeds",
    "extend",
    "gen_cigar",
    "ksw",
    "mark_primary",
    "mem_chain",
    "pairing",
    "pipeline",
    "reg2aln",
    "seq_to_codes",
    "smem",
    "sort_dedup_patch",
]
