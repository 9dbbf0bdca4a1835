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
import re
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


_LINEAR_SHIFT = 14  # 16 kb windows, same as BAI


class TabixAccumulator:
    """Streaming .tbi builder for the VCF preset (fmt=2: seq col 1, beg col
    2, end from the REF allele), keyed by chromosome name in order of first
    appearance.

    Mirrors ``bai.BaiAccumulator``'s two roles: feed features in file order
    and ``dump()``, or run one per executor part (part-relative voffsets,
    ``to_meta``) and fold the sidecars driver-side with ``merge_rebased``
    during the single-file merge — write-time index creation with no
    re-read of the output."""

    def __init__(self):
        from .bam_codec import reg2bin

        self._reg2bin = reg2bin
        self.names: list[str] = []
        self._idx: dict[str, int] = {}
        self.bins: list[dict[int, list[list[int]]]] = []
        self.linear: list[dict[int, int]] = []

    def _ref(self, name: str) -> int:
        i = self._idx.get(name)
        if i is None:
            i = len(self.names)
            self._idx[name] = i
            self.names.append(name)
            self.bins.append({})
            self.linear.append({})
        return i

    def add(self, name: str, beg0: int, end0: int, v: int, v_end: int) -> None:
        """One feature: 0-based half-open [beg0, end0), [v, v_end) voffsets."""
        r = self._ref(name)
        chunks = self.bins[r].setdefault(self._reg2bin(beg0, end0), [])
        if chunks and chunks[-1][1] == v:
            chunks[-1][1] = v_end
        else:
            chunks.append([v, v_end])
        linear = self.linear[r]
        for w in range(beg0 >> _LINEAR_SHIFT, ((end0 - 1) >> _LINEAR_SHIFT) + 1):
            if w not in linear or v < linear[w]:
                linear[w] = v

    def to_meta(self) -> dict:
        return {
            "names": self.names,
            "bins": [{str(b): c for b, c in r.items()} for r in self.bins],
            "linear": [{str(w): v for w, v in r.items()} for r in self.linear],
        }

    def merge_rebased(self, meta: dict, base: int) -> None:
        from .bai import rebase_voffset

        for local_i, name in enumerate(meta["names"]):
            g = self._ref(name)
            for b, chunks in meta["bins"][local_i].items():
                dest = self.bins[g].setdefault(int(b), [])
                for u, v in chunks:
                    u, v = rebase_voffset(u, base), rebase_voffset(v, base)
                    if dest and dest[-1][1] == u:
                        dest[-1][1] = v
                    else:
                        dest.append([u, v])
            linear = self.linear[g]
            for w_s, v in meta["linear"][local_i].items():
                w, v = int(w_s), rebase_voffset(v, base)
                if w not in linear or v < linear[w]:
                    linear[w] = v

    def dump(self) -> bytes:
        """Serialize + BGZF-compress (.tbi files are themselves BGZF)."""
        from .bgzf import EMPTY_GZIP_BLOCK, compress_block

        payload = bytearray(TBI_MAGIC)
        names_blob = b"".join(n.encode() + b"\x00" for n in self.names)
        payload += struct.pack(
            "<8i", len(self.names), 2, 1, 2, 0, ord("#"), 0, len(names_blob)
        )
        payload += names_blob
        for r in range(len(self.names)):
            payload += struct.pack("<i", len(self.bins[r]))
            for b in sorted(self.bins[r]):
                chunks = self.bins[r][b]
                payload += struct.pack("<Ii", b, len(chunks))
                for u, v in chunks:
                    payload += struct.pack("<QQ", u, v)
            lin = self.linear[r]
            n_intv = (max(lin) + 1) if lin else 0
            payload += struct.pack("<i", n_intv)
            prev = 0
            for w in range(n_intv):
                val = lin.get(w)
                if val is None:
                    val = prev
                else:
                    prev = val
                payload += struct.pack("<Q", val)
        out = b"".join(
            compress_block(bytes(payload[i : i + 60000]))
            for i in range(0, len(payload), 60000)
        )
        return out + EMPTY_GZIP_BLOCK


def _iter_bgzf_lines_with_voffsets(fh):
    """Yield ``(line_bytes, v_start, v_end)`` for each newline-terminated
    line of a BGZF text file.  End-of-block offsets are normalized to
    start-of-next-block, matching ``BgzfWriter.tell_virtual`` so a post-hoc
    index build is byte-comparable to the write-time one."""
    from .bgzf import BgzfBlock, decompress_block, read_block_header

    pos = 0
    carry = b""
    carry_v = 0
    while True:
        hdr = read_block_header(fh, pos)
        if hdr is None:
            break
        c_size, _ = hdr
        data = decompress_block(fh, BgzfBlock(pos, c_size, 0))
        next_pos = pos + c_size
        start = 0
        while True:
            i = data.find(b"\n", start)
            if i < 0:
                if data[start:]:
                    if not carry:
                        carry_v = (pos << 16) | start
                    carry += data[start:]
                break
            v_end = ((pos << 16) | (i + 1)) if i + 1 < len(data) else (next_pos << 16)
            if carry:
                yield carry + data[start:i], carry_v, v_end
                carry = b""
            else:
                yield data[start:i], (pos << 16) | start, v_end
            start = i + 1
        pos = next_pos


_END_RE = re.compile(r"(?:^|;)END=(\d+)")


def vcf_feature_span(line: str) -> tuple[str, int, int]:
    """``(contig, beg0, end0)`` of one VCF data line, 0-based half-open.
    END-aware like htsjdk's indexers (symbolic/structural alleles span to
    ``INFO END=``); otherwise the REF-allele span of the classic
    ``tabix -p vcf`` preset.  The read side's residual filter is END-aware
    (``vcf.variant_end``), so the index must cover the same span or pruning
    could drop a split the filter would keep."""
    f = line.split("\t", 8)
    beg0 = int(f[1]) - 1
    end0 = beg0 + max(1, len(f[3]))
    if len(f) > 7:
        m = _END_RE.search(f[7])
        if m:
            end0 = max(end0, int(m.group(1)))
    return f[0], beg0, end0


def create_tabix_index(path: str, out: str | None = None) -> None:
    """Sequential post-hoc ``.tbi`` build over an existing BGZF VCF (htsjdk
    ``TabixIndexCreator`` role).  Also the truth the distributed write-time
    build (``VcfSink.write(write_index=True)``) is byte-compared against in
    tests."""
    from .fsio import fs_open, fs_write_bytes

    acc = TabixAccumulator()
    with fs_open(path) as fh:
        for line, v, v_end in _iter_bgzf_lines_with_voffsets(fh):
            if line.startswith(b"#"):
                continue
            name, beg0, end0 = vcf_feature_span(line.decode())
            acc.add(name, beg0, end0, v, v_end)
    fs_write_bytes(out or path + ".tbi", acc.dump())
