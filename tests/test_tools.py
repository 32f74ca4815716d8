"""CLI tool tests (build_index / time_search)."""

import numpy as np
import pytest

from avxwindowfmindex_tpu.tools import build_index as build_cli
from avxwindowfmindex_tpu.tools import time_search as search_cli

from oracle import random_sequence
from avxwindowfmindex_tpu.models.config import AlphabetType


@pytest.fixture
def fasta(rng, tmp_path):
    seq = random_sequence(rng, 800, AlphabetType.DNA, clean=True)
    path = tmp_path / "g.fasta"
    with open(path, "w") as fh:
        fh.write(">chr_test\n")
        for i in range(0, len(seq), 60):
            fh.write(seq[i : i + 60].decode() + "\n")
    return str(path), seq


def test_build_index_cli(fasta, tmp_path, capsys):
    fasta_path, seq = fasta
    out = str(tmp_path / "g.awfmi")
    rc = build_cli.main([fasta_path, "--output", out, "--seed-length", "4",
                         "--ratio", "4"])
    assert rc == 0
    assert "bwtLength=801" in capsys.readouterr().out

    from avxwindowfmindex_tpu import SearchEngine, read_index_from_file

    index = read_index_from_file(out)
    assert index.config.kmer_length_in_seed_table == 4
    assert SearchEngine(index).count([seq[100:110]])[0] >= 1


def test_build_index_cli_raw_and_amino(rng, tmp_path, capsys):
    seq = random_sequence(rng, 400, AlphabetType.AMINO, clean=True)
    raw = tmp_path / "p.txt"
    raw.write_bytes(seq)
    out = str(tmp_path / "p.awfmi")
    rc = build_cli.main([str(raw), "--raw", "--amino", "--output", out,
                         "--seed-length", "2", "--ratio", "4"])
    assert rc == 0
    from avxwindowfmindex_tpu import AlphabetType as AT
    from avxwindowfmindex_tpu import read_index_from_file

    assert read_index_from_file(out).config.alphabet_type == AT.AMINO


@pytest.mark.parametrize("extra", [[], ["--count-only"], ["--ngram", "2"]])
def test_time_search_cli(fasta, tmp_path, capsys, extra):
    fasta_path, seq = fasta
    out = str(tmp_path / "g.awfmi")
    build_cli.main([fasta_path, "--output", out, "--seed-length", "3",
                    "--ratio", "4"])
    rc = search_cli.main([out, "-n", "50", "-k", "6", "--runs", "1"] + extra)
    assert rc == 0
    text = capsys.readouterr().out
    assert "queries/s" in text and "50 kmers" in text
