"""Native index artifact: versioned .npz checkpoint of the device-layout arrays.

The framework's checkpoint/resume story (SURVEY.md section 5): the .awry file
is kept for cross-validation with the reference, while this artifact is the
fast path - arrays are stored exactly as they ship to the device (no
bit-packing round trip), with a JSON header carrying the scalar metadata.
Save -> load is a field-identical round trip (the analog of
save_load_equality_test, src/fm_index.rs:1046-1088).
"""

from __future__ import annotations

import json

import numpy as np

from ..alphabet import Alphabet
from ..index import FmIndexData

ARTIFACT_VERSION = 3  # v3 adds mark_ratio; v2 added mark arrays (v1 loads with marks=None)


def save_artifact(index: FmIndexData, path: str, *, compress: bool = True) -> None:
    """``compress=False`` skips zlib - at genome scale (multi-GB arrays) the
    uncompressed write is minutes faster and the arrays barely compress."""
    meta = {
        "artifact_version": ARTIFACT_VERSION,
        "fm_version": index.version_number,
        "alphabet": index.alphabet.value,
        "sa_ratio": index.sa_ratio,
        "bwt_len": index.bwt_len,
        "kmer_len": index.kmer_len,
        "headers": index.headers,
        "has_marks": index.has_marks,
        "mark_ratio": index.mark_ratio,
    }
    arrays = dict(
        meta=np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8),
        planes=index.planes,
        milestones=index.milestones,
        prefix_sums=index.prefix_sums,
        sampled_sa=index.sampled_sa,
        kmer_table=index.kmer_table,
        seq_starts=index.seq_starts,
    )
    if index.has_marks:
        arrays.update(
            mark_bits=index.mark_bits,
            mark_milestones=index.mark_milestones,
            text_sampled_sa=index.text_sampled_sa,
        )
    if index.text_packed is not None:
        arrays["text_packed"] = index.text_packed
    (np.savez_compressed if compress else np.savez)(path, **arrays)


def load_artifact(path: str, *, strict: bool = False) -> FmIndexData:
    """Load a .npz index artifact; ``strict=True`` runs the value-level
    corruption checks (FmIndexData.validate strict mode) before returning."""
    with np.load(path) as z:
        meta = json.loads(bytes(z["meta"]).decode())
        if meta["artifact_version"] not in (1, 2, ARTIFACT_VERSION):
            raise ValueError(f"unsupported artifact version {meta['artifact_version']}")
        has_marks = bool(meta.get("has_marks")) and "mark_bits" in z
        index = FmIndexData(
            alphabet=Alphabet(meta["alphabet"]),
            planes=z["planes"],
            milestones=z["milestones"],
            prefix_sums=z["prefix_sums"],
            sampled_sa=z["sampled_sa"],
            sa_ratio=meta["sa_ratio"],
            bwt_len=meta["bwt_len"],
            kmer_table=z["kmer_table"],
            kmer_len=meta["kmer_len"],
            seq_starts=z["seq_starts"],
            headers=list(meta["headers"]),
            version_number=meta["fm_version"],
            mark_bits=z["mark_bits"] if has_marks else None,
            mark_milestones=z["mark_milestones"] if has_marks else None,
            text_sampled_sa=z["text_sampled_sa"] if has_marks else None,
            # v1/v2 artifacts predate the knob: marks were built at sa_ratio.
            mark_ratio=int(meta.get("mark_ratio", 0)),
            text_packed=z["text_packed"] if "text_packed" in z else None,
        )
    index.validate(strict=strict)
    return index
