"""FASTA source: window reassembly equals the raw reference (split
invariance across window/task sizes), coordinates are 1-based closed, and
the g19 GC profile matches a pure-Python recompute."""

from __future__ import annotations

from disq_original_spark.queries import QUERIES
from disq_original_spark.sources.fasta import FastaSource

FIXTURES = "/root/reference/src/test/resources"


def _raw(path: str) -> dict[str, str]:
    seqs: dict[str, list[str]] = {}
    name = None
    for line in open(path):
        if line.startswith(">"):
            name = line[1:].split()[0]
            seqs[name] = []
        else:
            seqs[name].append(line.strip())
    return {k: "".join(v).upper() for k, v in seqs.items()}


def test_fasta_windows_reassemble(spark):
    """Concatenated windows == the whole reference, for window sizes that
    do and don't divide line length, with multi-task contigs."""
    for path in (f"{FIXTURES}/valid.fasta", f"{FIXTURES}/test.fa"):
        want = _raw(path)
        for window, split in ((64, 2), (1000, 3), (37, 5)):
            rows = FastaSource().read(spark, path, window=window, split_windows=split).collect()
            got: dict[str, list] = {}
            for r in sorted(rows, key=lambda r: (r.contig, r.w_start)):
                assert r.w_end - r.w_start + 1 == len(r.seq)
                got.setdefault(r.contig, []).append((r.w_start, r.seq))
            # windows tile exactly: starts are 1, 1+w, 1+2w, ...
            for c, chunks in got.items():
                assert [s for s, _ in chunks] == [
                    1 + i * window for i in range(len(chunks))
                ], (path, window, c)
            assert {c: "".join(s for _p, s in v) for c, v in got.items()} == want


def test_g19_gc_matches_python(spark):
    want = _raw(f"{FIXTURES}/valid.fasta")
    got = QUERIES["g19_gc_windows"].build(spark, "unused").collect()
    assert len(got) == sum((len(s) + 49) // 50 for s in want.values())
    for r in got:
        w = want[r.contig][r.w_start - 1 : r.w_end]
        gc = sum(c in "GCgc" for c in w)
        assert (r.gc_count, r.n_count) == (gc, sum(c in "Nn" for c in w)), r
        assert r.gc_frac == round(gc / len(w), 4)
    # the CRAM test reference has meaningful GC variation, not a flat profile
    fracs = [r.gc_frac for r in got]
    assert max(fracs) - min(fracs) > 0.05


def test_g20_kmer_spectrum_matches_python(spark):
    """Full canonical 8-mer spectrum vs a brute-force Python recompute —
    pins the exactly-once tiling (window/task boundary k-mers counted once,
    never zero or twice) and the canonicalization."""
    from collections import Counter

    k = 8
    comp = str.maketrans("ACGT", "TGCA")
    want: Counter = Counter()
    for seq in _raw(f"{FIXTURES}/valid.fasta").values():
        for i in range(len(seq) - k + 1):
            km = seq[i : i + k]
            want[min(km, km.translate(comp)[::-1])] += 1
    got = {r.canon: r.n for r in QUERIES["g20_kmer_spectrum"].build(spark, "u").collect()}
    assert got == dict(want)


def test_g20_exactly_once_across_task_seams(spark):
    """The overlap lookahead must hand each task the bases past ITS OWN
    last window — run the spectrum at split_windows=2 (many task seams per
    contig) and it must equal both the single-task spectrum and Python."""
    from collections import Counter

    from disq_original_spark.queries.genomic import kmer_spectrum

    k = 8
    comp = str.maketrans("ACGT", "TGCA")
    want: Counter = Counter()
    for seq in _raw(f"{FIXTURES}/valid.fasta").values():
        for i in range(len(seq) - k + 1):
            km = seq[i : i + k]
            want[min(km, km.translate(comp)[::-1])] += 1
    seamed = {
        r.canon: r.n
        for r in kmer_spectrum(
            spark, f"{FIXTURES}/valid.fasta", k=k, window=50, split_windows=2
        ).collect()
    }
    assert seamed == dict(want)


def test_fasta_truncated_file_fails_loud(spark, tmp_path):
    """A .fai declaring more bases than the FASTA holds (stale index /
    truncated download) must raise, never emit short windows as if they
    were real sequence."""
    import shutil

    import pytest

    src = f"{FIXTURES}/test.fa"
    p = tmp_path / "trunc.fa"
    shutil.copy(src, p)
    shutil.copy(src + ".fai", str(p) + ".fai")
    with open(p, "r+b") as f:
        f.truncate(f.seek(0, 2) - 1000)  # chop the tail
    from disq_original_spark.sources.fasta import FastaSource

    df = FastaSource().read(spark, str(p), window=1000)
    with pytest.raises(Exception, match="stale or corrupt|yielded"):
        df.collect()


def test_g21_cpg_matches_python(spark):
    """Every window's C/G/CpG counts, obs/exp ratio and island flag vs a
    Python recompute — including CG dinucleotides that span a window
    boundary (counted in the window where the C sits, exactly once)."""
    seqs = _raw(f"{FIXTURES}/valid.fasta")
    got = QUERIES["g21_cpg_islands"].build(spark, "u").collect()
    w = 50
    total_cg = sum(r.n_cg for r in got)
    want_total = sum(s.count("CG") for s in seqs.values())
    assert total_cg == want_total  # exactly-once across all boundaries
    for r in got:
        body = seqs[r.contig][r.w_start - 1 : r.w_start - 1 + w]
        look = seqs[r.contig][r.w_start - 1 : r.w_start - 1 + w + 1]
        n_c, n_g = body.count("C"), body.count("G")
        n_cg = sum(1 for i in range(len(look) - 1) if look[i : i + 2] == "CG")
        assert (r.n_c, r.n_g, r.n_cg) == (n_c, n_g, n_cg), r
        oe = round(n_cg * len(body) / (n_c * n_g), 4) if n_c and n_g else 0.0
        assert r.obs_exp == oe
        assert r.is_island == ((n_c + n_g) / len(body) > 0.5 and oe > 0.6)
