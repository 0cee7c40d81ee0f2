from .artifact import load_artifact, save_artifact
from .awry_format import load_awry, save_awry
from .sequence_io import SequenceData, concat_records, parse_fasta, parse_fastq, read_sequence_file

__all__ = [
    "SequenceData",
    "concat_records",
    "parse_fasta",
    "parse_fastq",
    "read_sequence_file",
    "save_awry",
    "load_awry",
    "save_artifact",
    "load_artifact",
]
