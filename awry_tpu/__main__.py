"""Command-line interface: build and query FM-indexes from the shell.

The reference is a library with no CLI (SURVEY.md section 1); this thin
wrapper exists for operational convenience:

  python -m awry_tpu build genome.fasta -o genome.npz [--alphabet amino]
         [--sa-ratio 8] [--kmer-len 10] [--awry]
  python -m awry_tpu count genome.npz ACGT TTGA ...
  python -m awry_tpu locate genome.npz ACGT [--host]
  python -m awry_tpu info genome.npz
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _load(path: str):
    from .fm_index import FmIndex

    return FmIndex.load(path)


def cmd_build(args) -> int:
    from .alphabet import Alphabet
    from .fm_index import FmIndex
    from .index import FmBuildArgs

    alphabet = Alphabet.AMINO if args.alphabet.startswith("a") else Alphabet.NUCLEOTIDE
    t0 = time.perf_counter()
    fm = FmIndex.new(
        FmBuildArgs(
            input_file_src=args.input,
            alphabet=alphabet,
            suffix_array_compression_ratio=args.sa_ratio,
            lookup_table_kmer_len=args.kmer_len,
        )
    )
    out = args.output or (args.input + (".awry" if args.awry else ".npz"))
    if args.awry and not out.endswith(".awry"):
        print(
            f"error: --awry requires a .awry output path (got {out})", file=sys.stderr
        )
        return 2
    fm.save(out)
    report = fm.memory_report()
    num_records = len(fm.data.headers)
    record_symbols = fm.bwt_len() - 1 - (num_records - 1)  # minus inter-record delims
    print(
        f"built {out} in {time.perf_counter()-t0:.1f}s: "
        f"{record_symbols} symbols, {num_records} records, "
        f"{report['total']/1e6:.1f} MB",
        file=sys.stderr,
    )
    return 0


def cmd_count(args) -> int:
    from . import host_engine as he

    fm = _load(args.index)
    counts = (
        he.count_batch(fm.data, args.queries) if args.host else fm.parallel_count(args.queries)
    )
    for q, c in zip(args.queries, counts):
        print(f"{q}\t{int(c)}")
    return 0


def cmd_locate(args) -> int:
    from . import host_engine as he

    fm = _load(args.index)
    if args.host:
        hits_per_query = he.locate_batch(fm.data, args.queries)
    else:
        hits_per_query = [
            [(p.sequence_idx(), p.local_position()) for p in hits]
            for hits in fm.parallel_locate(args.queries)
        ]
    for q, hits in zip(args.queries, hits_per_query):
        for seq_idx, pos in sorted(hits):
            header = fm.data.headers[seq_idx]
            print(f"{q}\t{header}\t{pos}")
        if not hits:
            print(f"{q}\t-\t-")
    return 0


def cmd_info(args) -> int:
    fm = _load(args.index)
    print(
        json.dumps(
            {
                "alphabet": fm.alphabet().name.lower(),
                "bwt_len": fm.bwt_len(),
                "records": len(fm.data.headers),
                "sa_ratio": fm.suffix_array_compression_ratio(),
                "kmer_len": fm.data.kmer_len,
                "version": fm.version_number(),
                "has_marks": fm.data.has_marks,
                "memory_bytes": fm.memory_report(),
            },
            indent=2,
        )
    )
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="awry_tpu", description=__doc__)
    sub = parser.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="build an index from FASTA/FASTQ")
    b.add_argument("input")
    b.add_argument("-o", "--output", default=None)
    b.add_argument("--alphabet", choices=["nucleotide", "amino"], default="nucleotide")
    b.add_argument("--sa-ratio", type=int, default=None)
    b.add_argument("--kmer-len", type=int, default=None)
    b.add_argument("--awry", action="store_true", help="write reference .awry format")
    b.set_defaults(fn=cmd_build)

    for name, fn in (("count", cmd_count), ("locate", cmd_locate)):
        p = sub.add_parser(name, help=f"{name} queries against an index")
        p.add_argument("index")
        p.add_argument("queries", nargs="+")
        p.add_argument("--host", action="store_true", help="force the NumPy host engine")
        p.set_defaults(fn=fn)

    i = sub.add_parser("info", help="print index metadata")
    i.add_argument("index")
    i.set_defaults(fn=cmd_info)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
