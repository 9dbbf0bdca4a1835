"""Generate the committed GFF3 annotation fixture (fixtures/annotation.gff3)
for g25_gff_gene_model: a deterministic three-contig gene model — genes,
1-3 mRNA isoforms each, 2-6 exons per isoform with some exon spans SHARED
between isoforms (so the distinct-span rollup differs from the plain exon
count), both strands, a mix of '.' and numeric scores, and interleaved
comment lines the readers must skip.

Deterministic (seeded); re-running must reproduce the committed file
byte-for-byte (pinned by tests/test_gff.py::test_annotation_fixture_fresh).

Run from the repo root:  python tools/build_annotation_fixture.py
"""

from __future__ import annotations

import random
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
OUT = REPO / "fixtures" / "annotation.gff3"


def build() -> str:
    rng = random.Random(42)
    lines = ["##gff-version 3"]
    gid = 0
    for contig, n_genes in (("chr1", 18), ("chr2", 14), ("chrX", 8)):
        lines.append(f"##sequence-region {contig} 1 10000000")
        cursor = 1000
        for _ in range(n_genes):
            gid += 1
            gene_id = f"gene{gid:03d}"
            strand = rng.choice(["+", "-"])
            n_tx = rng.randint(1, 3)
            # exon skeleton for the gene: up to 8 candidate spans the
            # isoforms draw from, so spans repeat across isoforms
            n_slots = rng.randint(3, 8)
            slots = []
            pos = cursor + rng.randint(100, 500)
            for _ in range(n_slots):
                length = rng.randint(80, 400)
                slots.append((pos, pos + length - 1))
                pos += length + rng.randint(50, 300)
            gene_start, gene_end = slots[0][0], slots[-1][1]
            score = rng.choice([".", str(rng.randint(1, 1000))])
            lines.append(
                f"{contig}\ttestsrc\tgene\t{gene_start}\t{gene_end}\t{score}"
                f"\t{strand}\t.\tID={gene_id};Name=N{gid:03d}"
            )
            if rng.random() < 0.2:
                lines.append(f"# gene {gene_id} annotated by hand")
            for t in range(1, n_tx + 1):
                tx_id = f"{gene_id}.t{t}"
                k = rng.randint(2, len(slots))
                picked = sorted(rng.sample(range(len(slots)), k))
                tx_start = slots[picked[0]][0]
                tx_end = slots[picked[-1]][1]
                lines.append(
                    f"{contig}\ttestsrc\tmRNA\t{tx_start}\t{tx_end}\t."
                    f"\t{strand}\t.\tID={tx_id};Parent={gene_id}"
                )
                for e, si in enumerate(picked, start=1):
                    s, x = slots[si]
                    phase = rng.choice([".", "0", "1", "2"])
                    lines.append(
                        f"{contig}\ttestsrc\texon\t{s}\t{x}\t.\t{strand}"
                        f"\t{phase}\tID={tx_id}.e{e};Parent={tx_id}"
                    )
            cursor = gene_end + rng.randint(500, 2000)
    return "\n".join(lines) + "\n"


OUT_HISEQ = REPO / "fixtures" / "annotation_hiseq.gff3"


def build_hiseq() -> str:
    """Gene models spanning the HiSeq VCF's chr1 variant range (positions
    109..5,235,136) for g26_variant_annotation: ~115 genes with exon
    structure, every ~9th gene given an OVERLAPPING companion gene (so
    the multi-hit exonic/intronic tie-break paths actually execute), and
    a ``##sequence-region`` bound past the last variant — the trailing
    intergenic gap derives from it.  Deterministic (seeded); freshness
    pinned alongside the g25 fixture."""
    rng = random.Random(7)
    lines = ["##gff-version 3", "##sequence-region chr1 1 6000000"]
    gid = 0
    cursor = 2000
    while cursor < 5_150_000:
        gid += 1
        gene_id = f"hg{gid:03d}"
        strand = rng.choice(["+", "-"])
        n_slots = rng.randint(2, 6)
        slots = []
        pos = cursor
        for _ in range(n_slots):
            length = rng.randint(150, 900)
            slots.append((pos, pos + length - 1))
            pos += length + rng.randint(100, 1200)
        gene_start, gene_end = slots[0][0], slots[-1][1]
        lines.append(
            f"chr1\ttestsrc\tgene\t{gene_start}\t{gene_end}\t."
            f"\t{strand}\t.\tID={gene_id};Name=H{gid:03d}"
        )
        tx_id = f"{gene_id}.t1"
        lines.append(
            f"chr1\ttestsrc\tmRNA\t{gene_start}\t{gene_end}\t."
            f"\t{strand}\t.\tID={tx_id};Parent={gene_id}"
        )
        for e, (s, x) in enumerate(slots, start=1):
            lines.append(
                f"chr1\ttestsrc\texon\t{s}\t{x}\t.\t{strand}"
                f"\t.\tID={tx_id}.e{e};Parent={tx_id}"
            )
        span_end = gene_end
        if gid % 9 == 0:
            # overlapping companion: starts inside the gene, sometimes
            # nested (ends inside), sometimes staggered (ends past it)
            gid += 1
            comp_id = f"hg{gid:03d}"
            c_start = (gene_start + gene_end) // 2
            c_end = gene_end + rng.choice([-300, 1500])
            c_end = max(c_end, c_start + 200)
            lines.append(
                f"chr1\ttestsrc\tgene\t{c_start}\t{c_end}\t."
                f"\t{strand}\t.\tID={comp_id};Name=H{gid:03d}"
            )
            ctx = f"{comp_id}.t1"
            lines.append(
                f"chr1\ttestsrc\tmRNA\t{c_start}\t{c_end}\t."
                f"\t{strand}\t.\tID={ctx};Parent={comp_id}"
            )
            lines.append(
                f"chr1\ttestsrc\texon\t{c_start}\t{c_start + 150}\t.\t{strand}"
                f"\t.\tID={ctx}.e1;Parent={ctx}"
            )
            span_end = max(span_end, c_end)
        cursor = span_end + rng.randint(3_000, 75_000)
    return "\n".join(lines) + "\n"


if __name__ == "__main__":
    for out, text in ((OUT, build()), (OUT_HISEQ, build_hiseq())):
        out.write_text(text)
        n = sum(1 for ln in text.splitlines() if ln and not ln.startswith("#"))
        print(f"wrote {out} ({n} feature lines)")
