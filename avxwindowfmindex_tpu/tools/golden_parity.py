"""Build and drive the GOLDEN reference binary for parity checks.

The reference library (/root/reference, read-only) cannot compile as
shipped: its libdivsufsort and FastaVector submodules are empty. This
module builds it anyway, by pairing the untouched reference sources
with the two shims in avxwindowfmindex_tpu/native/golden/ (divsufsort64
backed by this repo's SA-IS; a minimal FastaVector matching the
documented usage), plus a small driver CLI (golden_driver.c). The
result is the actual reference implementation — its .awfmi bytes and
its hit lists are ground truth that tests/test_golden_reference.py
byte-compares against this repo's output.

CLI:
  python -m avxwindowfmindex_tpu.tools.golden_parity build [--out DIR]
  python -m avxwindowfmindex_tpu.tools.golden_parity demo  # self-check
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
GOLDEN_SRC = os.path.join(REPO, "avxwindowfmindex_tpu", "native", "golden")
HOST_CPP = os.path.join(REPO, "avxwindowfmindex_tpu", "native", "src", "awfm_host.cpp")
REFERENCE_SRC = os.environ.get("AWFM_REFERENCE_SRC", "/root/reference/src")
DEFAULT_OUT = os.path.join(REPO, "build", "golden")


def reference_available() -> bool:
    return os.path.isfile(os.path.join(REFERENCE_SRC, "AwFmIndex.h"))


def build_golden_driver(out_dir: str = DEFAULT_OUT, force: bool = False) -> str:
    """Compile the golden driver; returns the binary path.

    Rebuilds only when any input is newer than the existing binary.
    Raises on compile failure (callers may skip tests instead).
    """
    os.makedirs(out_dir, exist_ok=True)
    binary = os.path.join(out_dir, "golden_driver")
    inputs = [HOST_CPP] + [
        os.path.join(GOLDEN_SRC, f)
        for f in ("FastaVector.h", "divsufsort64.h", "golden_shims.c", "golden_driver.c")
    ]
    ref_sources = sorted(
        os.path.join(REFERENCE_SRC, f)
        for f in os.listdir(REFERENCE_SRC)
        if f.endswith(".c")
    )
    inputs += ref_sources
    if (
        not force
        and os.path.isfile(binary)
        and all(os.path.getmtime(binary) >= os.path.getmtime(p) for p in inputs)
    ):
        return binary

    objs = []

    def compile_one(cmd, obj):
        subprocess.run(cmd + ["-c", "-o", obj], check=True, capture_output=True)
        objs.append(obj)

    cflags = [
        "-O2",
        "-std=c17",
        "-mavx2",
        "-fopenmp",
        f"-I{GOLDEN_SRC}",
        f"-I{REFERENCE_SRC}",
    ]
    compile_one(["g++", "-O2", HOST_CPP], os.path.join(out_dir, "awfm_host.o"))
    for src in ref_sources + [
        os.path.join(GOLDEN_SRC, "golden_shims.c"),
        os.path.join(GOLDEN_SRC, "golden_driver.c"),
    ]:
        obj = os.path.join(
            out_dir, os.path.splitext(os.path.basename(src))[0] + ".o"
        )
        compile_one(["gcc", *cflags, src], obj)
    subprocess.run(
        ["g++", "-O2", "-fopenmp", *objs, "-o", binary, "-lm"],
        check=True,
        capture_output=True,
    )
    return binary


def run_driver(binary: str, *args: str) -> str:
    proc = subprocess.run(
        [binary, *args], check=True, capture_output=True, text=True
    )
    return proc.stdout


def _demo() -> int:
    import tempfile

    binary = build_golden_driver()
    with tempfile.TemporaryDirectory() as td:
        fasta = os.path.join(td, "demo.fasta")
        with open(fasta, "w") as fh:
            fh.write(">a\nGATTACAGATTACA\nACGTACGT\n>b\nTTTTGATTACATTTT\n")
        out = os.path.join(td, "demo.awfmi")
        print(run_driver(binary, "create-fasta", fasta, "dna", "4", "3", "1", out))
        kmers = os.path.join(td, "kmers.txt")
        with open(kmers, "w") as fh:
            fh.write("GATTACA\nACGT\nCCCC\n")
        print(run_driver(binary, "locate", out, kmers, "1"))
    return 0


def main(argv=None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv or argv[0] == "build":
        out = DEFAULT_OUT
        if len(argv) >= 3 and argv[1] == "--out":
            out = argv[2]
        print(build_golden_driver(out))
        return 0
    if argv[0] == "demo":
        return _demo()
    print(__doc__)
    return 2


if __name__ == "__main__":
    raise SystemExit(main())
