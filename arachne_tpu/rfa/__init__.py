from . import candidates, dupmark, engine, mapq, molecules, optimizer, scoring, split, types
from .candidates import ChainedHit, FastQRecordView, get_alignments, get_chains
from .engine import BarcodeResult, do_rfa_for_one_barcode, worth_running_rfa
from .types import Alignment, CandidateMolecule, MapQData, OrderedMap, Region

__all__ = [
    "Alignment",
    "BarcodeResult",
    "CandidateMolecule",
    "ChainedHit",
    "FastQRecordView",
    "MapQData",
    "OrderedMap",
    "Region",
    "candidates",
    "do_rfa_for_one_barcode",
    "dupmark",
    "engine",
    "get_alignments",
    "get_chains",
    "mapq",
    "molecules",
    "optimizer",
    "scoring",
    "split",
    "types",
    "worth_running_rfa",
]
