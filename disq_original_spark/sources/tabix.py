"""Tabix (.tbi) index reader and split pruning.

The reference prunes whole Hadoop splits that no query interval overlaps by
consulting the Tabix/Tribble index at ``getSplits`` time
(`tribble/TribbleIndexIntervalFilteringTextInputFormat.java:20-74`,
`vcf/VcfSource.java:143-168`).  This module is the Spark-side equivalent:
``file_ranges_for_intervals`` maps query intervals to compressed-byte ranges
via the index's R-tree bins, and the VCF source drops byte-range splits that
intersect none of them — partition pruning, before any task launches.

Format: SAM/tabix spec §5 (the .tbi layout is the BAI layout plus column
metadata); the file is itself BGZF-compressed.
"""

from __future__ import annotations

import gzip
import struct
from dataclasses import dataclass
from pathlib import Path

TBI_MAGIC = b"TBI\x01"


@dataclass
class TabixIndex:
    fmt: int
    col_seq: int
    col_beg: int
    col_end: int
    meta_char: str
    skip: int
    names: list[str]
    # per reference: {bin: [(chunk_begin_voffset, chunk_end_voffset), ...]}
    bins: list[dict[int, list[tuple[int, int]]]]
    # per reference: 16kb-window linear index of virtual offsets
    linear: list[list[int]]

    def ref_index(self, name: str) -> int:
        try:
            return self.names.index(name)
        except ValueError:
            return -1


def reg2bins(beg: int, end: int) -> list[int]:
    """All bins overlapping [beg, end) (0-based), BAI/tabix binning scheme."""
    out = [0]
    end -= 1
    for shift, offset in ((26, 1), (23, 9), (20, 73), (17, 585), (14, 4681)):
        out.extend(range(offset + (beg >> shift), offset + (end >> shift) + 1))
    return out


def parse_tabix(path: str | Path) -> TabixIndex:
    from .fsio import fs_read_bytes

    data = gzip.decompress(fs_read_bytes(str(path)))
    if data[:4] != TBI_MAGIC:
        raise ValueError(f"not a tabix index: magic {data[:4]!r}")
    (n_ref, fmt, col_seq, col_beg, col_end, meta, skip, l_nm) = struct.unpack_from(
        "<8i", data, 4
    )
    pos = 4 + 32
    names = [n.decode() for n in data[pos : pos + l_nm].split(b"\x00")[:-1]]
    pos += l_nm
    bins: list[dict[int, list[tuple[int, int]]]] = []
    linear: list[list[int]] = []
    for _ in range(n_ref):
        (n_bin,) = struct.unpack_from("<i", data, pos)
        pos += 4
        b: dict[int, list[tuple[int, int]]] = {}
        for _ in range(n_bin):
            bin_id, n_chunk = struct.unpack_from("<Ii", data, pos)
            pos += 8
            chunks = []
            for _ in range(n_chunk):
                u, v = struct.unpack_from("<QQ", data, pos)
                pos += 16
                chunks.append((u, v))
            b[bin_id] = chunks
        (n_intv,) = struct.unpack_from("<i", data, pos)
        pos += 4
        ioff = list(struct.unpack_from(f"<{n_intv}Q", data, pos))
        pos += 8 * n_intv
        bins.append(b)
        linear.append(ioff)
    return TabixIndex(fmt, col_seq, col_beg, col_end, chr(meta), skip, names, bins, linear)


def file_ranges_for_intervals(
    idx: TabixIndex, intervals: list[tuple[str, int, int]]
) -> list[tuple[int, int]]:
    """Merged compressed-byte ranges containing every record that may overlap
    any (contig, start, end) interval (1-based inclusive, like the
    reference's htsjdk Interval)."""
    raw: list[tuple[int, int]] = []
    for contig, start, end in intervals:
        ri = idx.ref_index(contig)
        if ri < 0:
            continue
        raw.extend(
            ((u >> 16), (v >> 16) + 1)
            for u, v in bin_query_chunks(idx.bins[ri], idx.linear[ri], start, end)
        )
    return merge_ranges(raw)


def prune_splits(
    splits: list[tuple[int, int]], ranges: list[tuple[int, int]]
) -> list[tuple[int, int]]:
    """Keep only byte-range splits intersecting at least one index range —
    the reference's split-level (not record-level) pruning."""
    if not ranges:
        return []
    out = []
    for s, e in splits:
        if any(s < re and rs < e for rs, re in ranges):
            out.append((s, e))
    return out


def bin_query_chunks(
    bins: dict[int, list[tuple[int, int]]],
    linear: list[int],
    start: int,
    end: int,
) -> list[tuple[int, int]]:
    """Shared R-tree bin query (SAM spec §5, used by both BAI and tabix):
    chunks possibly overlapping [start, end] (1-based inclusive), clamped by
    the 16 kb linear-index lower bound."""
    beg0 = max(0, start - 1)
    min_voff = linear[min(beg0 >> 14, len(linear) - 1)] if linear else 0
    out: list[tuple[int, int]] = []
    for b in reg2bins(beg0, end):
        for u, v in bins.get(b, ()):
            if v > min_voff:
                out.append((max(u, min_voff), v))
    return out


def merge_ranges(raw: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Sort + merge overlapping/adjacent (start, end) ranges."""
    if not raw:
        return []
    raw.sort()
    merged = [raw[0]]
    for s, e in raw[1:]:
        if s <= merged[-1][1]:
            merged[-1] = (merged[-1][0], max(merged[-1][1], e))
        else:
            merged.append((s, e))
    return merged
