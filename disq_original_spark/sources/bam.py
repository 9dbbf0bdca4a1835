"""BAM source/sink, Spark-first.

Read plan (reference lifecycle, SURVEY §3.1): driver reads the header and the
``.sbi`` index if present; byte-range splits are planned driver-side; each
task maps its range to a record-aligned virtual-offset chunk — via the SBI
(the reference's *intended* fast path, fixing its dead-code bug at
`bam/BamSource.java:74-92`) or the record guesser (`bam/BamSource.java:96-158`)
— then decodes records with the pure-Python codec.  Chunks tile exactly:
a record belongs to the split whose byte range contains its BGZF block start.

Write: executors encode BGZF parts without terminator; driver writes the
header block + EOF block and concatenates (reference `bam/BamSink.java:27-70`).

Scale note: per-record decode is Python, embarrassingly parallel across
chunks; rows reach the JVM as columnar Arrow batches (`arrow_xfer`), which
profiling showed is the lever that matters — the pickled-row path spent
~95% of task time on serialization, Arrow brings the end-to-end rate to
within ~2.5× of the raw single-core codec speed.
"""

from __future__ import annotations

from collections.abc import Sequence

import struct
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
)

from ..operators.interval import interval_filter
from .bam_codec import (
    BamRecordGuesser,
    MAX_READ_SIZE,
    SbiIndex,
    encode_bam_header,
    encode_record,
    parse_record,
)
from .bgzf import (
    EMPTY_GZIP_BLOCK,
    BgzfBlock,
    BgzfReader,
    BgzfWriter,
    compress_block,
    decompress_block,
    find_next_block,
    make_virtual_offset,
    read_block_header,
)
from .fsio import (
    METADATA_JOB_THRESHOLD,
    FileSystem,
    collect_metadata,
    fs_basename,
    fs_join,
    fs_open,
    fs_size,
    fs_write_bytes,
    get_fs,
    list_data_files,
)
from .headers import SamHeader, read_bam_header
from .merger import merge_parts
from .sam import (
    READS_COLUMNS,
    schema_ordered,
    validate_columns,
    with_alignment_span,
)

READS_SCHEMA = StructType(
    [
        StructField("qname", StringType()),
        StructField("flag", IntegerType()),
        StructField("rname", StringType()),
        StructField("pos", LongType()),
        StructField("mapq", IntegerType()),
        StructField("cigar", StringType()),
        StructField("rnext", StringType()),
        StructField("pnext", LongType()),
        StructField("tlen", LongType()),
        StructField("seq", StringType()),
        StructField("qual", StringType()),
        StructField("attributes", MapType(StringType(), StringType())),
    ]
)


def _find_first_record_voffset(fh, start: int, end: int, n_ref: int) -> int | None:
    """Heuristic boundary search: for each BGZF block starting in
    [start, end), try every uncompressed offset until the guesser confirms a
    record start (bounded by MAX_READ_SIZE examined bytes)."""
    guesser = BamRecordGuesser(n_ref)
    examined = 0
    block = find_next_block(fh, start, end)
    while block is not None and block.pos < end and examined < MAX_READ_SIZE:
        # window: this block + enough following data for 10 records
        window = bytearray()
        reader = BgzfReader(fh)
        reader.seek_virtual(make_virtual_offset(block.pos, 0))
        window.extend(reader.read(1 << 20))
        # a short read means the window reaches end-of-file: candidate
        # records must then tile the remaining bytes exactly
        window_at_eof = len(window) < (1 << 20)
        for uoff in range(min(block.u_size, len(window))):
            if guesser.is_record_start(window, uoff, at_eof=window_at_eof):
                return make_virtual_offset(block.pos, uoff)
            examined += 1
            if examined >= MAX_READ_SIZE:
                return None
        nxt = block.end
        hdr_fh_end = _file_len(fh)
        if nxt >= hdr_fh_end or nxt >= end:
            return None
        blk = _block_at(fh, nxt)
        if blk is None:
            return None
        block = blk
    return None


def _file_len(fh) -> int:
    fh.seek(0, 2)
    return fh.tell()


def _block_at(fh, pos: int) -> BgzfBlock | None:
    hdr = read_block_header(fh, pos)
    if hdr is None:
        return None
    return BgzfBlock(pos, hdr[0], hdr[1])


_TRIM_BYTES = 1 << 22  # drop consumed uncompressed prefix past this size


def _warn_if_missing_terminator(fh, flen: int, path: str) -> None:
    """A structurally-clean stop at end-of-file only proves completeness if
    the file ends with the BGZF EOF block — otherwise a tail truncated at a
    block boundary would read back silently as complete."""
    import warnings

    if flen < len(EMPTY_GZIP_BLOCK):
        return
    fh.seek(flen - len(EMPTY_GZIP_BLOCK))
    if fh.read(len(EMPTY_GZIP_BLOCK)) != EMPTY_GZIP_BLOCK:
        warnings.warn(
            f"{path}: no BGZF EOF terminator — file may be truncated at a "
            f"block boundary (htsjdk ParsingUtils would warn here too)",
            stacklevel=2,
        )


def _read_records_in_chunk(
    path: str,
    vstart: int,
    vend: int,
    ref_names: list[str],
    fs: FileSystem | None = None,
    with_voffsets: bool = False,
    fields: frozenset[str] | None = None,
):
    """Yield reads-schema rows for records whose start voffset is in
    [vstart, vend).

    Blocks are inflated once into a contiguous buffer and records parsed by
    offset — no per-record stream reads (the previous two-``read()``-calls-
    per-record form spent more time in buffer bookkeeping than in the actual
    decode).  A base table maps buffer offsets back to virtual offsets for
    the ``vend`` bound; the consumed prefix is trimmed at block granularity
    so memory stays bounded by a few blocks, not the chunk."""
    from .bam_codec import FIXED_RECORD_BYTES

    if fs is None:
        fs = get_fs(path)
    c0 = vstart >> 16
    # readahead on remote filesystems (no-op wrapper locally): the block
    # loop below reads strictly forward, so the next 4 MB downloads on a
    # background thread while this one inflates
    from .fsio import open_prefetched

    with open_prefetched(fs, path) as fh:
        fh.seek(0, 2)
        flen = fh.tell()
        if c0 >= flen > 0:
            # defense-in-depth only: split planning tiles [0, flen) and
            # index ranges are validated against flen at PLANNING time
            # (plan_file_meta), so this cannot fire from those paths — it
            # guards direct _read_records_in_chunk callers against a
            # chunk beyond end-of-file ever yielding nothing silently
            raise ValueError(
                f"{path}: chunk start voffset {vstart:#x} (compressed "
                f"offset {c0}) is at/past end-of-file ({flen}) — "
                "truncated BAM or stale index"
            )
        buf = bytearray()
        bases: list[tuple[int, int]] = []  # (buffer offset of block start, cpos)
        next_cpos = c0
        bi = 0

        def load_next_block() -> bool:
            nonlocal next_cpos
            if next_cpos >= flen:
                return False
            hdr = read_block_header(fh, next_cpos)
            if hdr is None:
                return False
            c_size, u_size = hdr
            data = decompress_block(fh, BgzfBlock(next_cpos, c_size, u_size))
            bases.append((len(buf), next_cpos))
            buf.extend(data)
            next_cpos += c_size
            return True

        if not load_next_block():
            return
        o = vstart & 0xFFFF
        while True:
            while o + 4 > len(buf):
                if not load_next_block():
                    if o == len(buf):
                        # clean end: chunk ends exactly on a boundary — but a
                        # BAM truncated at a block boundary looks identical,
                        # so when this chunk reaches end-of-file, require the
                        # 28-byte BGZF EOF terminator (htsjdk warns/errors on
                        # a missing terminator; lenient here: warn)
                        if next_cpos >= flen:
                            _warn_if_missing_terminator(fh, flen, path)
                        return
                    raise ValueError(
                        f"{path}: truncated BAM record header at EOF "
                        f"({len(buf) - o} trailing bytes)"
                    )
            (block_size,) = struct.unpack_from("<i", buf, o)
            if block_size < FIXED_RECORD_BYTES:
                raise ValueError(
                    f"{path}: corrupt BAM record (block_size={block_size})"
                )
            while o + 4 + block_size > len(buf):
                if not load_next_block():
                    raise ValueError(
                        f"{path}: truncated BAM record body at EOF "
                        f"(need {block_size} bytes)"
                    )
            while bi + 1 < len(bases) and bases[bi + 1][0] <= o:
                bi += 1
            v = (bases[bi][1] << 16) | (o - bases[bi][0])
            if v >= vend:
                return
            parsed = parse_record(buf, o, ref_names, fields)
            if parsed is None:
                return
            yield (parsed[0], v) if with_voffsets else parsed[0]
            o = parsed[1]
            if bases[bi][0] > _TRIM_BYTES:
                cut = bases[bi][0]
                del buf[:cut]
                bases = [(b - cut, c) for b, c in bases[bi:]]
                o -= cut
                bi = 0


#: sentinel: "compute this file's first-record voffset in the task" — the
#: driver reads ONE header per directory (the reference's same-header
#: contract, `HtsjdkReadsRddStorage.java:150-156`); other files resolve
#: their own header end lazily, one small read per task instead of O(files)
#: serial driver IO.
LAZY_FIRST_VOFFSET = -1


def _qname_before(
    path: str,
    fs: FileSystem,
    vstart: int,
    n_ref: int,
    ref_names: list[str],
    first_voffset: int,
) -> str | None:
    """qname of the record immediately preceding ``vstart`` (None at the
    first record).  Finds a record-aligned start in a widening lookback
    window (a BGZF block is ≤ 64 KiB compressed, so one block of lookback
    usually suffices) and decodes forward to ``vstart``."""
    if vstart <= first_voffset:
        return None
    target_c = vstart >> 16
    first_c = first_voffset >> 16
    lookback = 1 << 17
    while True:
        probe = max(first_c, target_c - lookback)
        if probe <= first_c:
            v0 = first_voffset
        else:
            with fs.open_input(path) as fh:
                v0 = _find_first_record_voffset(fh, probe, target_c + 1, n_ref)
        if v0 is not None and v0 < vstart:
            last = None
            for row in _read_records_in_chunk(path, v0, vstart, ref_names, fs):
                last = row
            if last is not None:
                return last["qname"]
        if probe <= first_c:
            return None
        lookback *= 2


def records_for_split(
    path: str,
    start: int,
    end: int,
    ref_names: list[str],
    n_ref: int,
    first_voffset: int,
    sbi_offsets: tuple[int, ...] | None,
    bai_ranges: list[tuple[int, int]] | None = None,
    fs: FileSystem | None = None,
    group_by_qname: bool = False,
    fields: frozenset[str] | None = None,
):
    """Yield reads-schema rows for the byte-range split [start, end): map the
    range to a record-aligned virtual-offset chunk (SBI fast path, else
    boundary guesser), then decode.  ``bai_ranges`` (interval pushdown)
    restricts decoding to the chunk ∩ index-range intersections — the
    reference's removeContentsBefore/After span intersection.  Shared by the
    RDD facade and the Python DataSource.

    ``group_by_qname`` (queryname-sorted inputs) enforces the reference's
    documented-but-unimplemented guarantee (README.md:155-159): paired
    reads never straddle partitions.  Ownership moves from records to qname
    GROUPS — a group belongs to the split containing its first record — so
    each split skips leading records belonging to its predecessor's final
    group and decodes past its end through the tail of its own final group.
    Any tiling still yields every record exactly once."""
    if fs is None:
        fs = get_fs(path)
    if first_voffset == LAZY_FIRST_VOFFSET and (sbi_offsets is None or group_by_qname):
        _header, _refs, first_voffset = read_bam_header(path)
    if sbi_offsets is not None:
        idx = SbiIndex(0, b"", b"", 0, 0, sbi_offsets)
        chunk = idx.chunk_for_split(start, end)
        if chunk is None:
            return
        vstart, vend = chunk
    else:
        first_c = first_voffset >> 16
        if end <= first_c:
            return
        with fs.open_input(path) as fh:
            if start <= first_c:
                vstart = first_voffset
            else:
                found = _find_first_record_voffset(fh, start, end, n_ref)
                if found is None:
                    return
                vstart = found
        vend = end << 16
    if group_by_qname:
        prev_q = _qname_before(path, fs, vstart, n_ref, ref_names, first_voffset)
        in_head = prev_q is not None
        last_q: str | None = None
        for row, v in _read_records_in_chunk(
            path, vstart, 1 << 62, ref_names, fs, with_voffsets=True, fields=fields
        ):
            q = row["qname"]
            if in_head:
                if q == prev_q:
                    continue  # predecessor split owns its final group's tail
                in_head = False
            if v < vend:
                yield row
                last_q = q
            elif last_q is not None and q == last_q:
                yield row  # tail of our final group, past the byte boundary
            else:
                return
        return
    if bai_ranges is None:
        yield from _read_records_in_chunk(path, vstart, vend, ref_names, fs, fields=fields)
        return
    for u, v in bai_ranges:
        lo, hi = max(u, vstart), min(v, vend)
        if lo < hi:
            yield from _read_records_in_chunk(path, lo, hi, ref_names, fs, fields=fields)


def _decode_splits_arrow(
    spark: SparkSession,
    split_rows: list[tuple[int, int, int]],
    file_params: list[tuple],
    fields: frozenset[str] | None = None,
) -> DataFrame:
    """Decode splits via the Arrow transfer plane (``arrow_xfer``): the
    decode is unchanged (``records_for_split``); tasks hand the JVM columnar
    Arrow batches instead of pickled rows.  ``fields`` prunes the decoded
    columns (the custom-source analog of a parquet scan's ReadSchema)."""
    from .arrow_xfer import rows_to_dataframe

    def split_records(task):
        fi, s, e = task
        f, refs, nref, fv, sbi, bai, fs, by_qname = file_params[fi]
        return records_for_split(
            f, s, e, refs, nref, fv, sbi, bai, fs, group_by_qname=by_qname,
            fields=fields,
        )

    if fields is None:
        cols, schema = READS_COLUMNS, READS_SCHEMA
    else:
        cols = schema_ordered(READS_COLUMNS, fields)
        schema = StructType([f for f in READS_SCHEMA.fields if f.name in fields])
    return rows_to_dataframe(spark, split_rows, split_records, cols, schema)


class BamSource:
    """Read BAM files into a reads DataFrame (splittable, index-aware)."""

    def read_header(self, path: str) -> SamHeader:
        header, refs, _ = read_bam_header(path)
        return header

    def read(
        self,
        spark: SparkSession,
        path: str,
        intervals: DataFrame | None = None,
        include_unplaced: bool = False,
        split_size: int = 128 * 1024 * 1024,
        use_sbi: bool = True,
        columns: Sequence[str] | None = None,
    ) -> DataFrame:
        """``columns`` prunes the DECODE, not just the projection: Python
        data sources have no ReadSchema pushdown, so without it every scan
        pays the full per-record materialization (CIGAR string join, seq
        nibble translate, qual translate, aux-tag dict walk) even for a
        3-column aggregate — the custom-source analog of a parquet scan
        reading all columns for a 2-column projection.  The returned frame
        carries exactly ``columns`` (schema order); internal needs
        (qname grouping, interval residual filtering) are decoded
        transparently and dropped before return."""
        if columns is not None:
            validate_columns(columns, READS_COLUMNS, "reads")
        fs = get_fs(path)
        files = _expand_files(path, fs)
        # ONE driver header read per input — directory files share a header
        # by contract (`HtsjdkReadsRddStorage.java:150-156`); per-file
        # metadata (size, indexes) is collected in a Spark job when the file
        # count is large, so driver planning stays O(1) in files.
        header, refs, first_voffset0 = read_bam_header(files[0])
        ref_names = [r[0] for r in refs]
        n_ref = len(refs)
        # Collect the (tiny) interval list once, not once per input file.
        iv_rows = (
            intervals.select("contig", "start", "end").collect()
            if intervals is not None and not include_unplaced
            else None
        )
        ivs = None
        if iv_rows is not None:
            name_to_id = {nm: i for i, nm in enumerate(ref_names)}
            ivs = [
                (name_to_id[r["contig"]], int(r["start"]), int(r["end"]))
                for r in iv_rows
                if r["contig"] in name_to_id
            ]
        metas = _collect_file_metadata(spark, files, fs, use_sbi, ivs)
        # queryname-sorted input: enforce the pair-integrity guarantee
        # (README.md:155-159) by switching record ownership to qname groups
        by_qname = header.sort_order == "queryname"
        split_rows: list[tuple[int, int, int]] = []
        file_params: list[tuple] = []
        for i, (f, flen, sbi_offsets, bai_ranges) in enumerate(metas):
            first_voffset = first_voffset0 if i == 0 else LAZY_FIRST_VOFFSET
            splits = [(s, min(s + split_size, flen)) for s in range(0, flen, split_size)]
            fi = len(file_params)
            file_params.append(
                (f, ref_names, n_ref, first_voffset, sbi_offsets, bai_ranges, fs, by_qname)
            )
            split_rows.extend((fi, s, e) for s, e in splits)

        fields = None
        if columns is not None:
            internal = set(columns)
            if by_qname:
                internal.add("qname")  # group ownership needs the name
            if intervals is not None or include_unplaced:
                # residual_traversal computes alignment spans + the
                # unplaced predicate from these
                internal |= {"flag", "rname", "pos", "cigar"}
            fields = frozenset(internal)
        reads = _decode_splits_arrow(spark, split_rows, file_params, fields)
        from ..operators.interval import residual_traversal

        out = residual_traversal(reads, intervals, include_unplaced)
        if columns is not None:
            out = out.select(*schema_ordered(READS_COLUMNS, columns))
        return out


def _collect_file_metadata(
    spark: SparkSession,
    files: list[str],
    fs: FileSystem,
    use_sbi: bool,
    ivs: list[tuple[int, int, int]] | None,
    job_threshold: int = METADATA_JOB_THRESHOLD,
) -> list[tuple[str, int, tuple[int, ...] | None, list[tuple[int, int]] | None]]:
    """(path, size, sbi_offsets, bai_ranges) per file — serially for a few
    files, via a Spark job for many (``fsio.collect_metadata``; a 100 TB
    directory has tens of thousands of shards — minutes of serial driver IO
    otherwise).  ``ivs`` are (ref_id, start, end) intervals for `.bai`
    interval pushdown (reference `AbstractBinarySamSource.java:96-113`);
    disabled when None."""

    def meta_for(f: str):
        flen = fs.size(f)
        sbi_path = f + ".sbi"
        sbi = SbiIndex.load(sbi_path) if use_sbi and fs.exists(sbi_path) else None
        bai_ranges = None
        max_coff = None
        if ivs is not None and fs.exists(f + ".bai"):
            from .bai import parse_bai, voffset_ranges_for_intervals

            idx = parse_bai(f + ".bai")
            bai_ranges = voffset_ranges_for_intervals(idx, ivs)
            # whole-index max (bin 37450 excluded: the SAM-spec pseudo-bin
            # carries mapped/unmapped COUNTS as fake chunk values)
            max_coff = max(
                (
                    v >> 16
                    for b in idx.bins
                    for bid, ch in b.items()
                    if bid != 37450
                    for _u, v in ch
                ),
                default=None,
            )
        elif ivs is not None and fs.exists(f + ".csi"):
            # CSI fallback: same R-tree query with parameterized binning —
            # contigs >2^29 bp can only ship a .csi
            from .csi import parse_csi
            from .csi import voffset_ranges_for_intervals as csi_ranges

            idx = parse_csi(f + ".csi")
            bai_ranges = csi_ranges(idx, ivs)
            max_real_bin = ((1 << (3 * (idx.depth + 1))) - 1) // 7
            max_coff = max(
                (
                    v >> 16
                    for b in idx.bins
                    for bid, (_loff, ch) in b.items()
                    if bid <= max_real_bin
                    for _u, v in ch
                ),
                default=None,
            )
        if max_coff is not None and max_coff > flen:
            # records_for_split clips every index range to its split's
            # [vstart, vend), and splits tile [0, flen) — so a range
            # pointing past end-of-file would be silently dropped and the
            # requested intervals' missing tail would vanish from the
            # result.  Same refuse-stale-index contract as the CRAM
            # .crai and VCF tabix paths: raise at planning time, over the
            # WHOLE index (the index is authoritative about what the file
            # must contain, regardless of which intervals this query asks
            # for).
            raise ValueError(
                f"{f}: index references compressed offset {max_coff} past "
                f"end-of-file ({flen}) — truncated BAM or stale index"
            )
        if (
            sbi is not None
            and sbi.offsets
            and (
                (sbi.offsets[-1] >> 16) > flen
                or (
                    (sbi.offsets[-1] >> 16) == flen
                    and (sbi.offsets[-1] & 0xFFFF) != 0
                )
            )
        ):
            # same contract for the .sbi split index: its last record
            # voffset must lie inside the file.  The end SENTINEL may sit
            # exactly at flen<<16 — htsjdk records BlockCompressedInputStream's
            # position at true EOF, which for a BAM lacking the optional
            # 28-byte EOF terminator block is exactly (flen, 0); samtools
            # treats a missing terminator as warn-only, so strict > mirrors
            # the BAI/tabix pointer-past-end convention (ADVICE r9).
            raise ValueError(
                f"{f}: .sbi references record voffset {sbi.offsets[-1]:#x} "
                f"past end-of-file ({flen}) — truncated BAM or stale index"
            )
        return (f, flen, sbi.offsets if sbi else None, bai_ranges)

    return collect_metadata(spark, files, meta_for, job_threshold)


def _expand_files(path: str, fs: FileSystem | None = None) -> list[str]:
    p = str(path)
    return list_data_files(fs or get_fs(p), p)


def _norm_attrs(row: dict) -> dict:
    """Arrow map cells may arrive as lists of (key, value) pairs; the encoder
    wants a dict."""
    a = row.get("attributes")
    if a is not None and not isinstance(a, dict):
        row["attributes"] = dict(a)
    return row


class BamSink:
    """Write a reads DataFrame as a single BAM file (headerless BGZF parts +
    driver header + EOF terminator + concat).

    ``write_sbi`` / ``write_bai`` create the indexes *at write time* — the
    reference can only do this for ``.sbi`` (its README marks ``.bai``
    writing ✗, `README.md:121-131`), and a post-hoc build would re-read
    the whole output serially on the driver.  Here each executor records
    part-relative index metadata while encoding its part (a few KB
    sidecar); the driver rebases virtual offsets by each part's byte
    offset during the merge and writes the index without touching the
    data again.  The ``.bai`` is byte-identical to a sequential post-hoc
    build; ``.sbi`` entry spacing restarts per part (every entry is still
    a true record start, entries are ≤ granularity apart — exactly what
    split planning needs)."""

    def write(
        self,
        df: DataFrame,
        header: SamHeader,
        path: str,
        *,
        write_sbi: bool = False,
        write_bai: bool = False,
        sbi_granularity: int = 4096,
    ) -> None:
        from .bai import BaiAccumulator, rebase_voffset
        from .bam_codec import cigar_ref_length, reg2bin

        refs = header.contigs
        ref_index = {name: i for i, (name, _len) in enumerate(refs)}
        n_ref = len(refs)
        temp_dir = f"{path}.parts-{uuid.uuid4().hex[:8]}"
        fs = get_fs(path)
        fs.mkdirs(temp_dir)
        index_on = write_sbi or write_bai

        def write_partition(pid, rows):
            import json as _json
            import uuid as _uuid

            tmp = fs_join(temp_dir, f".tmp-{_uuid.uuid4().hex}")
            wrote = False
            acc = BaiAccumulator(n_ref) if index_on else None
            offsets: list[int] = []
            n = 0
            last = None  # (ref_id, pos0, end0, provisional v_end) of final record
            with fs.open_output(tmp) as fh, BgzfWriter(fh, write_terminator=False) as w:
                for row in rows:
                    wrote = True
                    row = _norm_attrs(row)
                    rec = encode_record(row, ref_index)
                    if not index_on:
                        w.write(rec)
                        continue
                    v = w.tell_virtual()
                    if n % sbi_granularity == 0:
                        offsets.append(v)
                    n += 1
                    w.write(rec)
                    v_end = w.tell_virtual()
                    rname = row["rname"]
                    ref_id = ref_index.get(rname, -1) if rname else -1
                    pos0 = (row["pos"] or 0) - 1
                    end0 = (
                        pos0 + max(1, cigar_ref_length(row["cigar"] or "*"))
                        if ref_id >= 0 and pos0 >= 0
                        else 0
                    )
                    acc.add(ref_id, pos0, end0, v, v_end)
                    last = (ref_id, pos0, end0, v_end)
            if not wrote:
                fs.delete(tmp)
                return
            name = f"part-{pid:05d}"
            fs.rename(tmp, fs_join(temp_dir, name))
            if index_on:
                # The close() flush turned the pending buffer into the
                # part's final block; normalize the final record's chunk
                # end to start-of-next-block, matching what a sequential
                # reader (BgzfReader.tell_virtual) reports there.
                csize = w.compressed_bytes
                true_end = csize << 16
                if last is not None:
                    ref_id, pos0, end0, prov = last
                    if ref_id >= 0 and pos0 >= 0 and prov != true_end:
                        chunks = acc.bins[ref_id][reg2bin(pos0, end0)]
                        if chunks[-1][1] == prov:
                            chunks[-1][1] = true_end
                meta = {"n": n, "offsets": offsets, "csize": csize, **acc.to_meta()}
                with fs.open_output(fs_join(temp_dir, f".idx-{name}.json")) as mh:
                    mh.write(_json.dumps(meta).encode())

        from .arrow_xfer import foreach_partition_arrow

        foreach_partition_arrow(df, write_partition)

        header_bam = encode_bam_header(header.text, refs)
        header_block = b"".join(
            compress_block(header_bam[i : i + 60000]) for i in range(0, len(header_bam), 60000)
        )
        index_meta: list[dict] | None = None
        if index_on:
            import json

            from .merger import list_parts

            index_meta = []
            for p in sorted(list_parts(temp_dir)):
                with fs.open_input(fs_join(temp_dir, f".idx-{fs_basename(p)}.json")) as mh:
                    index_meta.append(json.loads(mh.read().decode()))
        merge_parts(temp_dir, path, header=header_block, terminator=EMPTY_GZIP_BLOCK)
        if not index_on:
            return
        base = len(header_block)
        sbi_offsets: list[int] = []
        total_records = 0
        bai_acc = BaiAccumulator(n_ref)
        for meta in index_meta:
            if write_sbi:
                sbi_offsets.extend(rebase_voffset(o, base) for o in meta["offsets"])
            if write_bai:
                bai_acc.merge_rebased(meta, base)
            total_records += meta["n"]
            base += meta["csize"]
        if write_sbi:
            idx = SbiIndex(
                file_length=base + len(EMPTY_GZIP_BLOCK),
                md5=b"\x00" * 16,
                uuid=b"\x00" * 16,
                total_records=total_records,
                granularity=sbi_granularity,
                offsets=tuple(sbi_offsets) + (base << 16,),
            )
            fs_write_bytes(path + ".sbi", idx.dump())
        if write_bai:
            fs_write_bytes(path + ".bai", bai_acc.dump())

    def write_sharded(
        self,
        df: DataFrame,
        header: SamHeader,
        path: str,
        *,
        write_index: bool = False,
        sbi_granularity: int = 4096,
    ) -> None:
        """One complete BAM (header + records + terminator) per partition in
        directory ``path`` (reference `sam/AnySamSinkMultiple.java:31-74`);
        the directory reads back as one input via ``BamSource.read``.

        ``write_index=True`` writes each shard's ``.sbi`` + ``.bai`` beside
        it, entirely executor-side: a shard is a complete file, so its
        accumulator offsets rebase by the header length locally — no driver
        merge step at all, unlike the single-file sink.  Directory reads
        pick the per-file indexes up for chunking and interval pushdown,
        so this is the scale shape: index creation cost is O(shard) per
        executor, O(0) on the driver.

        Precondition (the same one ``samtools index`` places on its input):
        rows must be position-sorted within each partition — e.g.
        ``df.sortWithinPartitions("rname", "pos")`` — because the BAI
        linear index's fill-forward semantics assume voffsets grow with
        position per reference; a ``.bai`` built over interleaved
        positions can prune incorrectly."""
        refs = header.contigs
        n_ref = len(refs)
        ref_index = {name: i for i, (name, _len) in enumerate(refs)}
        header_bam = encode_bam_header(header.text, refs)
        header_block = b"".join(
            compress_block(header_bam[i : i + 60000]) for i in range(0, len(header_bam), 60000)
        )
        fs = get_fs(path)
        fs.delete(path, recursive=True)
        fs.mkdirs(path)

        def write_partition(pid, rows):
            import uuid as _uuid

            from .bai import BaiAccumulator, rebase_voffset
            from .bam_codec import SbiIndex, cigar_ref_length, reg2bin

            hb = len(header_block)
            acc = BaiAccumulator(n_ref) if write_index else None
            offsets: list[int] = []
            n = 0
            last = None
            wrote = False
            tmp = fs_join(path, f".tmp-{_uuid.uuid4().hex}")
            with fs.open_output(tmp) as fh:
                fh.write(header_block)
                with BgzfWriter(fh, write_terminator=True) as w:
                    for row in rows:
                        wrote = True
                        row = _norm_attrs(row)
                        rec = encode_record(row, ref_index)
                        if not write_index:
                            w.write(rec)
                            continue
                        v = rebase_voffset(w.tell_virtual(), hb)
                        if n % sbi_granularity == 0:
                            offsets.append(v)
                        n += 1
                        w.write(rec)
                        v_end = rebase_voffset(w.tell_virtual(), hb)
                        rname = row["rname"]
                        ref_id = ref_index.get(rname, -1) if rname else -1
                        pos0 = (row["pos"] or 0) - 1
                        end0 = (
                            pos0 + max(1, cigar_ref_length(row["cigar"] or "*"))
                            if ref_id >= 0 and pos0 >= 0
                            else 0
                        )
                        acc.add(ref_id, pos0, end0, v, v_end)
                        last = (ref_id, pos0, end0, v_end)
            if not wrote:
                fs.delete(tmp)
                return
            name = f"part-{pid:05d}.bam"
            fs.rename(tmp, fs_join(path, name))
            if not write_index:
                return
            csize = hb + w.compressed_bytes  # terminator excluded by writer
            true_end = csize << 16
            if last is not None:
                ref_id, pos0, end0, prov = last
                if ref_id >= 0 and pos0 >= 0 and prov != true_end:
                    chunks = acc.bins[ref_id][reg2bin(pos0, end0)]
                    if chunks[-1][1] == prov:
                        chunks[-1][1] = true_end
            shard = fs_join(path, name)
            fs_write_bytes(shard + ".bai", acc.dump())
            idx = SbiIndex(
                file_length=csize + len(EMPTY_GZIP_BLOCK),
                md5=b"\x00" * 16,
                uuid=b"\x00" * 16,
                total_records=n,
                granularity=sbi_granularity,
                offsets=tuple(offsets) + (csize << 16,),
            )
            fs_write_bytes(shard + ".sbi", idx.dump())

        from .arrow_xfer import foreach_partition_arrow

        foreach_partition_arrow(df, write_partition)


def create_sbi(bam_path: str, granularity: int = 4096) -> str:
    """Write a ``.sbi`` splitting index for a BAM (reference
    `htsjdk/samtools/BAMSBIIndexer.java:43-64`; format `SBIIndex.java`).
    Driver-side single pass; records every Nth record's virtual offset plus
    the end sentinel."""
    _, refs, first_voffset = read_bam_header(bam_path)
    ref_names = [r[0] for r in refs]
    offsets = []
    n = 0
    with fs_open(bam_path) as fh:
        reader = BgzfReader(fh)
        reader.seek_virtual(first_voffset)
        while True:
            v = reader.tell_virtual()
            size_b = reader.read(4)
            if len(size_b) < 4:
                end_v = v
                break
            (block_size,) = struct.unpack("<i", size_b)
            body = reader.read(block_size)
            if len(body) < block_size:
                end_v = v
                break
            if n % granularity == 0:
                offsets.append(v)
            n += 1
    offsets.append(end_v)
    idx = SbiIndex(
        file_length=fs_size(bam_path),
        md5=b"\x00" * 16,
        uuid=b"\x00" * 16,
        total_records=n,
        granularity=granularity,
        offsets=tuple(offsets),
    )
    out = bam_path + ".sbi"
    fs_write_bytes(out, idx.dump())
    return out
