r"""VCF source and sink, Spark-first.

Source paths (reference parity: `vcf/VcfSource.java:45-186`):
- plain ``.vcf`` (and true-gzip ``.vcf.gz``): ``spark.read.text`` — Spark's
  text source is splittable for plain text and handles gzip (one partition
  per gzip file, exactly like the reference's non-BGZF path).
- BGZF (``.bgz``, or a ``.gz`` that sniffs as BGZF — the reference's
  BGZFEnhancedGzipCodec distinction): custom splittable read — byte ranges
  are planned on the driver and each task yields the lines *owned* by its
  range via ``bgzf.iter_lines_in_range`` (exactly-once tiling).

Parsing is 100% native column expressions (split / transform /
map_from_entries) — the whole decode stays in Tungsten codegen; the only
Python-per-row path is BGZF block decompression, which is IO-bound zlib.

Variants schema (SURVEY §1.3): contig pos id ref alts qual filters info
genotypes.  Conventions: ``id``/``qual`` NULL for '.'; ``filters`` NULL for
'.', empty array for PASS; ``info`` map value '' for flag keys.
"""

from __future__ import annotations

import uuid

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .fsio import fs_basename, fs_join, fs_open, get_fs, list_data_files
from .headers import read_vcf_header_text, vcf_sample_names
from .merger import merge_parts

VARIANTS_COLUMNS = ["contig", "pos", "id", "ref", "alts", "qual", "filters", "info", "genotypes"]


def _null_if_dot(c: Column) -> Column:
    return F.when(c == ".", F.lit(None)).otherwise(c)


_GT_STRUCT = "struct<sample:string,gt:string,attrs:map<string,string>>"


def _sql_map_entries_last_wins(entries: str) -> str:
    """SQL-text twin of ``functions.map_from_entries_last_wins`` (same
    guard-then-dedup shape; see that docstring for the semantics)."""
    keys = f"transform({entries}, e -> e.key)"
    deduped = (
        f"filter({entries}, (e, i) -> NOT exists("
        f"slice({entries}, i + 2, size({entries})), later -> later.key = e.key))"
    )
    return (
        f"CASE WHEN size(array_distinct({keys})) = size({entries}) "
        f"THEN map_from_entries({entries}) ELSE map_from_entries({deduped}) END"
    )


def _sql_map_arrays_last_wins(keys: str, values: str) -> str:
    """SQL-text twin of ``functions.map_from_arrays_last_wins``."""
    entries = f"zip_with({keys}, {values}, (k, v) -> named_struct('key', k, 'value', v))"
    return (
        f"CASE WHEN size(array_distinct({keys})) = size({keys}) "
        f"THEN map_from_arrays({keys}, {values}) "
        f"ELSE {_sql_map_entries_last_wins(entries)} END"
    )


def _sql_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def parse_vcf_lines(lines: DataFrame, sample_names: list[str], value_col: str = "value") -> DataFrame:
    """Parse raw VCF body lines into the variants schema.

    The projection is rendered as SQL TEXT and handed to ``selectExpr`` —
    one JVM parse — rather than composed through the Column API: building
    the higher-order map/dedup expressions op-by-op costs thousands of py4j
    round trips (~0.4 s of driver time per plan, growing with sample count),
    which dominated small reads.  The expression tree is identical; only the
    construction path changed.
    """
    v = f"`{value_col}`"

    def at(i: int) -> str:
        return f"try_element_at(split({v}, '\\t'), {i})"

    key = "substring_index(kv, '=', 1)"
    info_entries = (
        f"transform(split({at(8)}, ';'), kv -> named_struct("
        f"'key', {key}, "
        f"'value', CASE WHEN length({key}) < length(kv) "
        f"THEN substr(kv, length({key}) + 2, length(kv)) ELSE '' END))"
    )
    info = (
        f"CASE WHEN {at(8)} = '.' THEN map() "
        f"ELSE {_sql_map_entries_last_wins(info_entries)} END"
    )

    format_keys = f"split({at(9)}, ':')"

    def _sample_map(i: int) -> str:
        # clamp BOTH arrays to the shorter length: a sample with more (or
        # fewer) ':'-subfields than FORMAT keys must degrade per lenient
        # semantics, not crash map_from_arrays with a length mismatch
        vals = f"split({at(10 + i)}, ':')"
        n = f"least(size({format_keys}), size({vals}))"
        return _sql_map_arrays_last_wins(
            f"slice({format_keys}, 1, {n})", f"slice({vals}, 1, {n})"
        )

    if sample_names:
        # two-stage projection: materialize each sample's attrs map once,
        # then reference it twice (gt lookup + attrs) — keeps the rendered
        # text linear in sample count
        lines = lines.selectExpr(
            v, *[f"{_sample_map(i)} AS __sm{i}" for i in range(len(sample_names))]
        )
        genotypes = (
            "array("
            + ", ".join(
                f"named_struct('sample', {_sql_str(s)}, "
                f"'gt', try_element_at(__sm{i}, 'GT'), 'attrs', __sm{i})"
                for i, s in enumerate(sample_names)
            )
            + ")"
        )
    else:
        genotypes = f"cast(array() AS array<{_GT_STRUCT}>)"

    return lines.selectExpr(
        f"{at(1)} AS contig",
        f"try_cast({at(2)} AS bigint) AS pos",
        f"nullif({at(3)}, '.') AS id",
        f"{at(4)} AS ref",
        f"CASE WHEN {at(5)} = '.' THEN cast(array() AS array<string>) "
        f"ELSE split({at(5)}, ',') END AS alts",
        f"try_cast(nullif({at(6)}, '.') AS double) AS qual",
        f"CASE WHEN {at(7)} = '.' THEN cast(NULL AS array<string>) "
        f"WHEN {at(7)} = 'PASS' THEN cast(array() AS array<string>) "
        f"ELSE split({at(7)}, ';') END AS filters",
        f"{info} AS info",
        f"{genotypes} AS genotypes",
    )


def variant_end(info: Column, pos: Column, ref: Column) -> Column:
    """1-based inclusive end: INFO/END when present (symbolic alleles), else
    pos + len(ref) - 1 — htsjdk VariantContext.getEnd semantics."""
    return F.coalesce(
        F.try_element_at(info, F.lit("END")).try_cast("long"),
        pos + F.length(ref) - 1,
    )


# Default split size, defined ONCE: it is both read()'s parameter default
# and _native_text_ok's "caller did not tune split_size" sentinel — two
# copies of the literal could drift and silently route reads to the wrong
# scan path.
_DEFAULT_SPLIT_SIZE = 128 * 1024 * 1024


class VcfSource:
    """Read VCF (plain / gzip / BGZF) into a variants DataFrame.

    Directory inputs must be compression-homogeneous (all BGZF or all
    plain/gzip — what every sharded writer, including ours, produces).  The
    format is sniffed from the first file; the wrapper read paths then
    verify every file's magic bytes during the existing per-file metadata
    pass and fail fast on a mismatch instead of decoding garbage."""

    def read_header(self, path: str) -> str:
        return read_vcf_header_text(path)

    def read(
        self,
        spark: SparkSession,
        path: str,
        intervals: DataFrame | None = None,
        split_size: int = _DEFAULT_SPLIT_SIZE,
        stringency: str = "lenient",
    ) -> DataFrame:
        from .bgzf import is_bgzf

        header_text = read_vcf_header_text(path)
        samples = vcf_sample_names(header_text)

        with fs_open(_first(path)) as fh:
            bgzf = is_bgzf(fh)
        ivs = None
        if intervals is not None:
            ivs = [
                (r["contig"], int(r["start"]), int(r["end"]))
                for r in intervals.select("contig", "start", "end").collect()
            ]
        if bgzf:
            # tabix split pruning: with intervals + a .tbi, drop byte-range
            # splits the index proves contain no overlapping record
            # (reference `vcf/VcfSource.java:143-168`)
            lines = _read_bgzf_lines(spark, path, split_size, ivs=ivs)
        else:
            fs = get_fs(str(path))
            files = list_data_files(fs, str(path))
            if any(f.endswith(".gz") for f in files):
                # non-BGZF gzip: native whole-file gunzip stream
                # (non-splittable, one partition per file — reference
                # `vcf/VcfSource.java:80-86`).  The explicit file list keeps
                # index sidecars out of a directory read.
                lines = spark.read.text(files)
            elif ivs is None and _native_text_ok(fs, split_size):
                # no intervals → nothing to prune: the native JVM text scan
                # (whole-stage codegen) beats any Python range reader; the
                # explicit file list keeps index sidecars out of a
                # directory read.  Only taken when the scheme is JVM-visible
                # (a registered mock:// / Arrow-only scheme must stay on the
                # wrapper) and the caller did not tune split_size (the
                # native scan partitions by spark.sql.files.maxPartitionBytes,
                # not our knob).
                lines = spark.read.text(files)
            else:
                # Plain text: per-file byte-range splits, pruned per file by
                # that file's Tribble `.idx` when intervals are given
                # (reference picks the index per format: tabix for .bgz/.gz,
                # Tribble for .vcf — `vcf/VcfSource.java:143-168`,
                # `tribble/TribbleIndexIntervalFilteringTextInputFormat.java:33-67`).
                # Falls back to the native scan when nothing was pruned and
                # the native path is available.
                lines = _read_text_lines(spark, files, split_size, ivs)
        body = lines.filter(~F.col("value").startswith("#"))
        from .sam import apply_stringency

        f = F.split(F.col("value"), "\t")
        malformed = (F.size(f) < 8) | F.try_element_at(f, F.lit(2)).try_cast(
            "long"
        ).isNull()
        body = apply_stringency(body, malformed, stringency)
        variants = parse_vcf_lines(body, samples)
        if intervals is None:
            return variants
        from ..operators.interval import residual_variant_overlap

        return residual_variant_overlap(variants, intervals)


def _first(path: str):
    from .headers import first_file_in

    return first_file_in(path)


def _read_bgzf_lines(
    spark: SparkSession,
    path: str,
    split_size: int,
    ivs: list[tuple[str, int, int]] | None = None,
) -> DataFrame:
    """Plan byte ranges on the driver; tasks decode their ranges' lines.

    Partition planning matches the reference's split model (splitSize →
    ranges); each task re-opens the file locally — at cluster scale `path`
    is on a shared store and the open goes through the cluster filesystem.
    With ``ivs`` (interval list), each file's own tabix ``.tbi`` (or
    tabix-flavored ``.csi``) prunes that file's splits — per-file, so a
    sharded directory with per-shard indexes prunes every shard; for many
    files the size+index metadata collection runs as a Spark job, keeping
    driver planning O(1) (same policy as BamSource)."""
    from pyspark.sql.types import StringType, StructField, StructType

    from .fsio import collect_metadata, list_data_files

    fs = get_fs(path)
    files = list_data_files(fs, str(path))

    def meta_for(f: str):
        # compression homogeneity: the directory was sniffed BGZF from its
        # first file — a plain-text shard here would decode as garbage rows,
        # so fail fast with the offending file named
        from .bgzf import is_bgzf

        with fs.open_input(f) as fh:
            if not is_bgzf(fh):
                raise ValueError(
                    f"{f}: not BGZF, but the first file of this input is — "
                    "VCF directory inputs must be compression-homogeneous"
                )
        flen = fs.size(f)
        franges = None
        max_coff = None
        if ivs is not None:
            tbi, csi = f + ".tbi", f + ".csi"
            if fs.exists(tbi):
                from .tabix import file_ranges_for_intervals, parse_tabix

                idx = parse_tabix(tbi)
                franges = file_ranges_for_intervals(idx, ivs)
                # bin 37450 is the SAM-spec pseudo-bin: its "chunks" are
                # (span voffsets) + (mapped, unmapped COUNTS) — the counts
                # are not offsets and must not feed the max
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
            elif fs.exists(csi):
                # tabix-flavored CSI fallback (contigs >2^29 bp can only
                # ship a .csi; `tabix -C` output)
                from .csi import file_ranges_for_intervals as csi_ranges
                from .csi import parse_csi

                idx = parse_csi(csi)
                franges = csi_ranges(idx, ivs)
                # CSI pseudo-bins sit above the deepest real bin for the
                # index's depth; their "chunks" are counts, not offsets
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
            # split tiles only cover [0, flen), so index ranges past EOF
            # would be silently pruned away and the requested intervals'
            # missing tail would vanish from the result — same refuse-
            # stale-index contract as the CRAM .crai and BAM .bai paths.
            # The check is over the WHOLE index (its max chunk end), not
            # just the ranges the requested intervals touch: the index is
            # authoritative about what the file must contain, so a file
            # shorter than the index promises is untrustworthy regardless
            # of which intervals this particular query asks for.
            raise ValueError(
                f"{f}: index references compressed offset {max_coff} past "
                f"end-of-file ({flen}) — truncated VCF or stale index"
            )
        return (f, flen, franges)

    ranges: list[tuple[str, int, int]] = []
    for f, flen, franges in collect_metadata(spark, files, meta_for):
        fr = [(s, min(s + split_size, flen)) for s in range(0, flen, split_size)]
        if franges is not None:
            from .tabix import prune_splits

            fr = prune_splits(fr, franges)
        ranges.extend((f, s, e) for s, e in fr)
    if not ranges:
        ranges = [(files[0], 0, 0)]

    def read_range(task):
        from .bgzf import iter_lines_in_range
        from .fsio import open_prefetched

        f, s, e = task
        # readahead on remote filesystems: the block decode loop is strictly
        # sequential, so the next 4 MB downloads while this one inflates
        with open_prefetched(fs, f) as fh:
            for line in iter_lines_in_range(fh, s, e):
                yield {"value": line.decode("utf-8", "replace")}

    from .arrow_xfer import rows_to_dataframe

    return rows_to_dataframe(
        spark,
        ranges,
        read_range,
        ["value"],
        StructType([StructField("value", StringType())]),
    )


def _native_text_ok(fs, split_size: int) -> bool:
    """True when the native JVM text scan may replace the wrapper-routed
    Python range reader: the files live on the plain local filesystem (a
    registered mock:// or Arrow-only scheme is invisible to the JVM) and
    the caller left ``split_size`` at its default (the native scan
    partitions by spark.sql.files.maxPartitionBytes, so a tuned
    ``split_size`` must go through the range reader to be honored)."""
    from .fsio import LocalFileSystem

    return isinstance(fs, LocalFileSystem) and split_size == _DEFAULT_SPLIT_SIZE


def _read_text_lines(
    spark: SparkSession,
    files: list[str],
    split_size: int,
    ivs: list[tuple[str, int, int]] | None,
) -> DataFrame:
    """Plain-text analog of ``_read_bgzf_lines``: per-file byte-range splits
    planned driver-side (as a Spark job for many files), each file's splits
    pruned by that file's own Tribble ``.idx`` raw byte ranges when ``ivs``
    is given, each task yielding the lines it owns
    (``tribble.iter_text_lines_in_range``)."""
    from pyspark.sql.types import StringType, StructField, StructType

    from .fsio import collect_metadata
    from .tabix import prune_splits

    fs = get_fs(files[0])

    def meta_for(f: str):
        # compression homogeneity (mirror of the BGZF path's check): this
        # directory was sniffed plain-text — a BGZF/gzip shard fed to a
        # byte-range text reader would yield binary garbage
        from .bgzf import is_bgzf

        with fs.open_input(f) as fh:
            if is_bgzf(fh):
                raise ValueError(
                    f"{f}: BGZF, but the first file of this input is plain "
                    "text — VCF directory inputs must be compression-homogeneous"
                )
        flen = fs.size(f)
        franges = None
        if ivs is not None and fs.exists(f + ".idx"):
            from .tribble import parse_tribble, text_ranges_for_intervals

            franges = text_ranges_for_intervals(parse_tribble(f + ".idx"), ivs)
        return (f, flen, franges)

    metas = collect_metadata(spark, files, meta_for)
    if all(franges is None for _f, _l, franges in metas) and _native_text_ok(
        fs, split_size
    ):
        # no file has an index → no split can be pruned; the native JVM
        # text scan beats the Python range reader (residual filtering
        # happens downstream either way); same scheme/split_size guard as
        # the caller's fallback
        return spark.read.text(files)
    ranges: list[tuple[str, int, int]] = []
    for f, flen, franges in metas:
        fr = [(s, min(s + split_size, flen)) for s in range(0, flen, split_size)]
        if franges is not None:
            fr = prune_splits(fr, franges)
        ranges.extend((f, s, e) for s, e in fr)
    if not ranges:
        ranges = [(files[0], 0, 0)]

    def read_range(task):
        from .tribble import iter_text_lines_in_range

        p, s, e = task
        with fs.open_input(p) as fh:
            for line in iter_text_lines_in_range(fh, s, e):
                yield {"value": line.decode("utf-8", "replace")}

    from .arrow_xfer import rows_to_dataframe

    return rows_to_dataframe(
        spark,
        ranges,
        read_range,
        ["value"],
        StructType([StructField("value", StringType())]),
    )


def to_vcf_line(sample_names: list[str]) -> Column:
    """Native expression rebuilding the VCF line from the variants columns."""
    qual = F.when(F.col("qual").isNull(), ".").otherwise(
        F.when(
            F.col("qual") == F.col("qual").cast("long").cast("double"),
            F.col("qual").cast("long").cast("string"),
        ).otherwise(F.col("qual").cast("string"))
    )
    filters = (
        F.when(F.col("filters").isNull(), ".")
        .when(F.size("filters") == 0, "PASS")
        .otherwise(F.array_join("filters", ";"))
    )
    info = F.when(F.size(F.map_entries("info")) == 0, ".").otherwise(
        F.array_join(
            F.transform(
                F.map_entries("info"),
                lambda e: F.when(e["value"] == "", e["key"]).otherwise(
                    F.concat(e["key"], F.lit("="), e["value"])
                ),
            ),
            ";",
        )
    )
    base = F.concat_ws(
        "\t",
        F.col("contig"),
        F.col("pos").cast("string"),
        F.coalesce(F.col("id"), F.lit(".")),
        F.col("ref"),
        F.when(F.size("alts") == 0, ".").otherwise(F.array_join("alts", ",")),
        qual,
        filters,
        info,
    )
    if not sample_names:
        return base
    # FORMAT is declared from sample 1's attrs keys; every sample's values
    # are then emitted BY THOSE KEYS, so a sample whose key set diverged
    # under the lenient per-sample clamp can never write values misaligned
    # with the FORMAT declaration.  Mid-array absences become '.'; TRAILING
    # absences are trimmed (the VCF-spec "trailing fields can be dropped"
    # form), which keeps parse→write→parse lossless for short samples.
    fmt_keys = F.map_keys(F.element_at(F.col("genotypes"), 1)["attrs"])
    fmt = F.array_join(fmt_keys, ":")

    def sample_values(i: int) -> Column:
        attrs = F.element_at(F.col("genotypes"), i + 1)["attrs"]
        vals = F.transform(fmt_keys, lambda k: F.try_element_at(attrs, k))
        present_idx = F.zip_with(
            vals,
            F.sequence(F.lit(1), F.size(vals)),
            lambda v, j: F.when(v.isNotNull(), j).otherwise(0),
        )
        last = F.greatest(F.array_max(present_idx), F.lit(1))
        return F.when(F.size(vals) == 0, F.lit("")).otherwise(
            F.array_join(F.slice(vals, 1, last), ":", ".")
        )

    sample_cols = F.concat_ws(
        "\t", *[sample_values(i) for i in range(len(sample_names))]
    )
    return F.concat_ws("\t", base, fmt, sample_cols)


class VcfSink:
    """Write a variants DataFrame to a single VCF — plain text or BGZF
    (.bgz) with terminator-less parts + driver header + EOF block
    (reference `vcf/VcfSink.java:23-69`)."""

    def write(
        self,
        df: DataFrame,
        header_text: str,
        path: str,
        sample_names: list[str] | None = None,
        *,
        write_index: bool = False,
    ) -> None:
        samples = sample_names if sample_names is not None else vcf_sample_names(header_text)
        lines = df.select(to_vcf_line(samples).alias("value"))
        temp_dir = f"{path}.parts-{uuid.uuid4().hex[:8]}"
        compressed = path.endswith((".bgz", ".gz"))
        if not compressed:
            lines.write.mode("overwrite").text(temp_dir)
            merge_parts(temp_dir, path, header=header_text.encode())
            if write_index:
                # Plain text gets the Tribble .idx, like the reference's
                # per-format index choice on the read side.  The Spark
                # native text writer offers no per-part hook, so this one
                # is a driver-side pass over the (text) output.
                from .tribble import create_tribble_index

                create_tribble_index(path)
            return

        fs = get_fs(path)
        fs.mkdirs(temp_dir)

        def write_partition(pid, rows):
            import json as _json
            import uuid as _uuid

            from .bgzf import BgzfWriter
            from .tabix import TabixAccumulator, vcf_feature_span

            tmp = fs_join(temp_dir, f".tmp-{_uuid.uuid4().hex}")
            wrote = False
            acc = TabixAccumulator() if write_index else None
            last = None  # (name, beg0, end0, provisional v_end)
            with fs.open_output(tmp) as fh, BgzfWriter(fh, write_terminator=False) as w:
                for row in rows:
                    wrote = True
                    line = row["value"]
                    if not write_index:
                        w.write(line.encode() + b"\n")
                        continue
                    v = w.tell_virtual()
                    w.write(line.encode() + b"\n")
                    v_end = w.tell_virtual()
                    cname, beg0, end0 = vcf_feature_span(line)
                    acc.add(cname, beg0, end0, v, v_end)
                    last = (cname, beg0, end0, v_end)
            if not wrote:
                fs.delete(tmp)
                return
            name = f"part-{pid:05d}"
            fs.rename(tmp, fs_join(temp_dir, name))
            if write_index:
                # normalize the final feature's chunk end to the part's
                # start-of-next-block (see BamSink.write)
                csize = w.compressed_bytes
                true_end = csize << 16
                if last is not None and last[3] != true_end:
                    cname, beg0, end0, prov = last
                    chunks = acc.bins[acc._idx[cname]][acc._reg2bin(beg0, end0)]
                    if chunks[-1][1] == prov:
                        chunks[-1][1] = true_end
                meta = {"csize": csize, **acc.to_meta()}
                with fs.open_output(fs_join(temp_dir, f".idx-{name}.json")) as mh:
                    mh.write(_json.dumps(meta).encode())

        from .arrow_xfer import foreach_partition_arrow

        foreach_partition_arrow(lines, write_partition)

        from .bgzf import EMPTY_GZIP_BLOCK, compress_block

        header_block = b"".join(
            compress_block(header_text.encode()[i : i + 60000])
            for i in range(0, len(header_text.encode()), 60000)
        )
        index_meta: list[dict] = []
        if write_index:
            import json

            from .merger import list_parts

            for p in sorted(list_parts(temp_dir)):
                with fs.open_input(fs_join(temp_dir, f".idx-{fs_basename(p)}.json")) as mh:
                    index_meta.append(json.loads(mh.read().decode()))
        merge_parts(temp_dir, path, header=header_block, terminator=EMPTY_GZIP_BLOCK)
        if write_index:
            from .fsio import fs_write_bytes
            from .tabix import TabixAccumulator

            acc = TabixAccumulator()
            base = len(header_block)
            for meta in index_meta:
                acc.merge_rebased(meta, base)
                base += meta["csize"]
            fs_write_bytes(path + ".tbi", acc.dump())

    def write_sharded(
        self,
        df: DataFrame,
        header_text: str,
        path: str,
        sample_names: list[str] | None = None,
        *,
        write_index: bool = False,
    ) -> None:
        """One complete VCF per partition in directory ``path`` (reference
        `vcf/VcfSinkMultiple.java:12-45`); BGZF-compressed when the directory
        name ends in .bgz/.gz (e.g. out.vcf.bgz.sharded).

        ``write_index=True`` writes each shard's index beside it, entirely
        executor-side (a shard is a complete file — no driver merge): tabix
        ``.tbi`` inline for BGZF shards; Tribble ``.idx`` for plain-text
        shards via a local second pass over the just-written shard.
        Precondition (as for ``tabix``/``samtools`` themselves): rows must
        be position-sorted within each partition, e.g.
        ``df.sortWithinPartitions("contig", "pos")``."""
        samples = sample_names if sample_names is not None else vcf_sample_names(header_text)
        lines = df.select(to_vcf_line(samples).alias("value"))
        compressed = ".bgz" in fs_basename(path) or ".gz" in fs_basename(path)
        fs = get_fs(path)
        fs.delete(path, recursive=True)
        fs.mkdirs(path)

        def write_partition(pid, rows):
            import uuid as _uuid

            from .bgzf import BgzfWriter
            from .tabix import TabixAccumulator, vcf_feature_span

            wrote = False
            tmp = fs_join(path, f".tmp-{_uuid.uuid4().hex}")
            acc = TabixAccumulator() if (write_index and compressed) else None
            last = None
            if compressed:
                with fs.open_output(tmp) as fh, BgzfWriter(fh, write_terminator=True) as w:
                    w.write(header_text.encode())
                    for row in rows:
                        wrote = True
                        line = row["value"]
                        if acc is None:
                            w.write(line.encode() + b"\n")
                            continue
                        v = w.tell_virtual()
                        w.write(line.encode() + b"\n")
                        v_end = w.tell_virtual()
                        cname, beg0, end0 = vcf_feature_span(line)
                        acc.add(cname, beg0, end0, v, v_end)
                        last = (cname, beg0, end0, v_end)
            else:
                with fs.open_output(tmp) as fh:
                    fh.write(header_text.encode())
                    for row in rows:
                        wrote = True
                        fh.write(row["value"].encode() + b"\n")
            if not wrote:
                fs.delete(tmp)
                return
            ext = ".vcf.bgz" if compressed else ".vcf"
            shard = fs_join(path, f"part-{pid:05d}{ext}")
            fs.rename(tmp, shard)
            if not write_index:
                return
            if compressed:
                from .fsio import fs_write_bytes

                true_end = w.compressed_bytes << 16
                if last is not None and last[3] != true_end:
                    cname, beg0, end0, prov = last
                    chunks = acc.bins[acc._idx[cname]][acc._reg2bin(beg0, end0)]
                    if chunks[-1][1] == prov:
                        chunks[-1][1] = true_end
                fs_write_bytes(shard + ".tbi", acc.dump())
            else:
                from .tribble import create_tribble_index

                create_tribble_index(shard)

        from .arrow_xfer import foreach_partition_arrow

        foreach_partition_arrow(lines, write_partition)
