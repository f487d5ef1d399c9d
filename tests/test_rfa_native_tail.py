"""Field-level parity: native RFA tail (native/rfa_tail.cpp) vs Python tail.

The Python implementation (molecules.py/optimizer.py/mapq.py) is the
authoritative reference; the C++ port must reproduce every output field —
including jitter-tie placements, OrderedMap-order-dependent optimizer
outcomes, molecule MAPQ and the second-best bookkeeping — bit for bit.
"""

import copy
import os

import numpy as np
import pytest

from arachne_tpu.config import ArachneConfig
from arachne_tpu.index import FMIndex, build_fmindex, pack_reference
from arachne_tpu.io.simulate import SimConfig, simulate_linked_reads
from arachne_tpu.io.fastq import iter_barcode_sets
from arachne_tpu.rfa.engine import do_rfa_for_one_barcode
from arachne_tpu.rfa.native_tail import native_rfa_enabled
from arachne_tpu.rfa.types import Region

pytestmark = pytest.mark.skipif(
    not native_rfa_enabled(), reason="native rfa_tail unavailable"
)

FIELDS = [
    "active", "is_proper", "bwa_pick", "mapq", "molecule_id",
    "active_molecule", "molecule_confidence", "molecule_difference",
    "sum_move_probability_change",
]
MD_FIELDS = [
    "second_best_score", "second_best_proper_pair",
    "second_best_molecule_reads", "second_best_molecule_confidence",
    "copies", "copies_in_active_molecules",
    "copies_outside_active_molecules", "unique_molecules_active",
    "score", "reads_in_molecule",
]


@pytest.fixture(scope="module")
def fixture(tmp_path_factory):
    rng = np.random.default_rng(17)
    # repeat-bearing genome so ties/molecule moves genuinely occur
    g = rng.integers(0, 4, 300_000).astype(np.uint8)
    g[120_000:123_000] = g[40_000:43_000]
    genome = "".join("ACGT"[c] for c in g)
    tmp = tmp_path_factory.mktemp("nat_tail")
    contigs = [("chrN", "", genome)]
    with open(tmp / "ref.fa", "w") as fh:
        fh.write(">chrN\n" + "\n".join(genome[i:i+70] for i in range(0, len(genome), 70)) + "\n")
    r1, r2 = str(tmp / "r1.fq.gz"), str(tmp / "r2.fq.gz")
    simulate_linked_reads(
        contigs, r1, r2,
        SimConfig(n_barcodes=8, molecules_per_barcode=3, molecule_len=20_000,
                  pairs_per_molecule=10, indel_rate=0.2, seed=2,
                  invalid_every=5),
    )
    from arachne_tpu.index.build import build_index_files, load_index

    build_index_files(str(tmp / "ref.fa"))
    packed, fm = load_index(str(tmp / "ref.fa.arx.npz"))
    idx = FMIndex(packed, fm)
    return idx, r1, r2


def _snapshot(res):
    out = []
    for arr in res.alignments:
        for al in arr:
            row = [getattr(al, f) for f in FIELDS]
            md = al.mapq_data
            row += [getattr(md, f) for f in MD_FIELDS]
            row.append(md.second_best.id if md.second_best is not None else None)
            row.append(al.mate_alignment.id if al.mate_alignment is not None else None)
            out.append((al.read_name, al.id, tuple(row)))
    return out


def test_native_tail_field_parity(fixture):
    idx, r1, r2 = fixture
    cfg = ArachneConfig()
    cen = {"chrN": Region(start=200_000, end=210_000)}
    n_checked = 0
    for records, unique in iter_barcode_sets(r1, r2):
        os.environ["ARACHNE_NATIVE_RFA"] = "0"
        res_py = do_rfa_for_one_barcode(idx, cfg, records, unique, cen)
        os.environ["ARACHNE_NATIVE_RFA"] = "1"
        res_nat = do_rfa_for_one_barcode(idx, cfg, records, unique, cen)
        os.environ.pop("ARACHNE_NATIVE_RFA", None)
        assert res_py.ran_rfa == res_nat.ran_rfa
        assert res_py.n_molecules == res_nat.n_molecules
        a, b = _snapshot(res_py), _snapshot(res_nat)
        assert a == b, (
            [x for x, y in zip(a, b) if x != y][:3],
            [y for x, y in zip(a, b) if x != y][:3],
        )
        n_checked += 1
    assert n_checked >= 6  # incl. invalid-barcode (no-RFA) sets
