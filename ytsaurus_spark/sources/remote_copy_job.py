"""Cross-cluster RemoteCopy: chunk-verbatim table transfer between two
independent cluster namespaces.

Reference semantics (yt/yt/server/job_proxy/remote_copy_job.cpp;
yt.wrapper.run_remote_copy, run_operation_commands.py:387):

- the operation runs against the DESTINATION cluster and PULLS chunks
  from a named source cluster; data moves chunk-block-verbatim — blocks
  are never decompressed or re-encoded in flight (the job copies
  compressed blocks + chunk meta as-is);
- jobs fan out over chunks, so the copy is chunk-parallel with no
  central data path;
- ``copy_attributes`` carries the table's attributes to the destination
  (the reference notes atomicity requires a single source table then);
- multiple source tables concatenate into one destination table;
- frozen dynamic tables can be copied; mounted ones cannot.

Spark-first shape: a "cluster" here is a ``YtClient`` (independent
cypress root). The chunk list becomes a DataFrame and ``mapInPandas``
tasks do the byte-verbatim copy — each task reads a source chunk file,
checksums it (murmur32, the repo's xdelta-consistent hash), writes it to
the destination staging dir, and re-checksums what it wrote, so the
"wire" has end-to-end integrity verification per chunk. Parquet chunk
files transfer without decode, exactly like the reference's
no-recompression block copy. The driver only moves the chunk MANIFEST
(paths + checksums), never data.

At 100 TB the chunk list is millions of entries — that manifest is still
only O(chunks) driver memory, and the copy itself scales with executors.
A real multi-datacenter deployment would swap the ``shutil`` byte path
for an object-store client inside the same mapInPandas task; the plan
shape (chunk manifest → partitioned verbatim copy → checksum barrier →
atomic commit) is what remote_copy_job.cpp runs.
"""

from __future__ import annotations

import os
import shutil
from typing import Iterable

from ytsaurus_spark.functions.xdelta import murmur32
from ytsaurus_spark.sources.formats import _write_attrs, table_attributes


class RemoteCopyError(RuntimeError):
    pass


def _chunk_files(table_dir: str) -> list[str]:
    """Data chunk files of a static table dir (parquet parts), sorted for
    deterministic destination naming."""
    if not os.path.isdir(table_dir):
        raise RemoteCopyError(f"source table not found: {table_dir}")
    return sorted(
        f for f in os.listdir(table_dir)
        if f.endswith(".parquet") or f.endswith(".snappy.parquet")
    )


def _is_dynamic(table_dir: str) -> bool:
    return bool(table_attributes(table_dir).get("dynamic")) or os.path.exists(
        os.path.join(table_dir, "_log.json")
    )


def _dyn_files(table_dir: str) -> list[str]:
    """All files of a frozen dynamic table tree, relative paths."""
    out = []
    for root, _dirs, files in os.walk(table_dir):
        for f in files:
            rel = os.path.relpath(os.path.join(root, f), table_dir)
            out.append(rel)
    return sorted(out)


def _remote_copy_erasure(
    dst_client, src_dir: str, destination_table: str, copy_attributes: bool
) -> dict:
    """RemoteCopy of an ERASURE-CODED table with in-flight repair
    (remote_copy_job.cpp:385-449 repair_erasure_chunks): each chunk job
    gathers the surviving parts, decodes (repairing erased parts from
    the codec's survivors), re-encodes the FULL part set and writes it
    to the destination — the copy heals degraded chunks instead of
    propagating the damage."""
    import pandas as pd

    from ytsaurus_spark.sources.erasure import get_codec

    attrs = table_attributes(src_dir)
    codec_name = attrs["erasure_codec"]
    chunks = attrs["erasure_chunks"]
    dst_dir = dst_client._fs(destination_table)
    staging = dst_dir + ".remote_copy_tmp"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)

    spark = dst_client.spark
    manifest = spark.createDataFrame(
        [(os.path.join(src_dir, c), os.path.join(staging, c)) for c in chunks],
        "src string, dst string",
    ).repartition(min(len(chunks), 32))

    def copy_repair(batches):
        cdc = get_codec(codec_name)
        for pdf in batches:
            rows = []
            for src, dst in zip(pdf["src"], pdf["dst"]):
                have = {}
                for i in range(cdc.total):
                    p = f"{src}.e{i}"
                    if os.path.exists(p):
                        with open(p, "rb") as fh:
                            have[i] = fh.read()
                full = cdc.repair(have)
                for i, part in full.items():
                    with open(f"{dst}.e{i}", "wb") as fh:
                        fh.write(part)
                rows.append((src, cdc.total - len(have), len(full)))
            yield pd.DataFrame(
                rows, columns=["src", "n_repaired", "n_parts"]
            )

    stats = manifest.mapInPandas(
        copy_repair, schema="src string, n_repaired long, n_parts long"
    ).collect()
    if len(stats) != len(chunks):
        shutil.rmtree(staging, ignore_errors=True)
        raise RemoteCopyError(f"copied {len(stats)} of {len(chunks)} chunks")
    shutil.rmtree(dst_dir, ignore_errors=True)
    os.makedirs(os.path.dirname(dst_dir), exist_ok=True)
    os.replace(staging, dst_dir)
    out_attrs = dict(attrs) if copy_attributes else {
        "erasure_codec": codec_name, "erasure_chunks": chunks
    }
    _write_attrs(dst_dir, out_attrs)
    return {
        "chunks": len(chunks),
        "parts_repaired": int(sum(r.n_repaired for r in stats)),
        "tables": 1,
    }


def run_remote_copy(
    dst_client,
    source_table,
    destination_table: str,
    *,
    source_client,
    copy_attributes: bool = True,
    repair_erasure_chunks: bool = False,
) -> dict:
    """Pull ``source_table`` (str or list) from ``source_client``'s
    cluster into ``destination_table`` on ``dst_client``'s cluster.

    Returns a summary dict: ``{"chunks": n, "bytes": total, "tables": k}``.
    Raises RemoteCopyError on checksum mismatch, a mounted dynamic
    source, or attribute-copy over multiple sources (the reference's
    atomicity note)."""
    tables = [source_table] if isinstance(source_table, str) else list(source_table)
    if not tables:
        raise RemoteCopyError("no source tables")
    if copy_attributes and len(tables) > 1:
        raise RemoteCopyError(
            "copy_attributes requires a single source table (atomicity — "
            "run_remote_copy docstring note)"
        )
    for t in tables:
        if any(ch in t for ch in "{}[]"):
            raise RemoteCopyError(f"rich YPath selectors unsupported here: {t!r}")

    src_dirs = [source_client._fs(t) for t in tables]
    if repair_erasure_chunks:
        if len(tables) > 1:
            raise RemoteCopyError("erasure repair copies one table at a time")
        if not table_attributes(src_dirs[0]).get("erasure_codec"):
            raise RemoteCopyError(
                f"{tables[0]} is not erasure-coded; repair_erasure_chunks "
                "needs an erasure_codec attribute"
            )
        return _remote_copy_erasure(
            dst_client, src_dirs[0], destination_table, copy_attributes
        )
    dynamic = [_is_dynamic(d) for d in src_dirs]
    if any(dynamic):
        if len(tables) > 1:
            raise RemoteCopyError("dynamic tables copy one at a time")
        from ytsaurus_spark.sources.tx_table import LogTxTable

        lt = LogTxTable(source_client.spark, src_dirs[0], key_cols=[])
        if lt.tablet_state() != "frozen":
            raise RemoteCopyError(
                "dynamic table must be frozen before RemoteCopy (the "
                "reference rejects mounted sources)"
            )

    dst_dir = dst_client._fs(destination_table)
    staging = dst_dir + ".remote_copy_tmp"
    shutil.rmtree(staging, ignore_errors=True)
    os.makedirs(staging)

    # chunk manifest: (absolute source file, absolute destination file)
    jobs: list[tuple[str, str]] = []
    if dynamic and dynamic[0]:
        for rel in _dyn_files(src_dirs[0]):
            dst_f = os.path.join(staging, rel)
            os.makedirs(os.path.dirname(dst_f), exist_ok=True)
            jobs.append((os.path.join(src_dirs[0], rel), dst_f))
    else:
        for ti, d in enumerate(src_dirs):
            for ci, f in enumerate(_chunk_files(d)):
                jobs.append(
                    (
                        os.path.join(d, f),
                        os.path.join(staging, f"part-{ti:04d}-{ci:05d}.parquet"),
                    )
                )
    if not jobs:
        raise RemoteCopyError(f"source has no chunks: {tables}")

    spark = dst_client.spark
    manifest = spark.createDataFrame(jobs, "src string, dst string").repartition(
        min(len(jobs), 32)
    )

    def copy_chunks(batches: Iterable) -> Iterable:
        import pandas as pd

        for pdf in batches:
            rows = []
            for src, dst in zip(pdf["src"], pdf["dst"]):
                with open(src, "rb") as f:
                    blob = f.read()
                crc = murmur32(blob)
                with open(dst, "wb") as f:
                    f.write(blob)
                with open(dst, "rb") as f:
                    crc_written = murmur32(f.read())
                rows.append((src, len(blob), crc, crc_written))
            yield pd.DataFrame(
                rows, columns=["src", "nbytes", "crc", "crc_written"]
            )

    stats = manifest.mapInPandas(
        copy_chunks, schema="src string, nbytes long, crc long, crc_written long"
    ).collect()

    bad = [r.src for r in stats if r.crc != r.crc_written]
    if bad:
        shutil.rmtree(staging, ignore_errors=True)
        raise RemoteCopyError(f"checksum mismatch on chunks: {bad[:3]}")
    if len(stats) != len(jobs):
        shutil.rmtree(staging, ignore_errors=True)
        raise RemoteCopyError(f"copied {len(stats)} of {len(jobs)} chunks")

    # atomic commit: the destination table appears all-or-nothing
    if not (dynamic and dynamic[0]):
        open(os.path.join(staging, "_SUCCESS"), "w").close()
    shutil.rmtree(dst_dir, ignore_errors=True)
    os.makedirs(os.path.dirname(dst_dir), exist_ok=True)
    os.replace(staging, dst_dir)

    if copy_attributes:
        attrs = table_attributes(src_dirs[0])
        if attrs:
            _write_attrs(dst_dir, attrs)
    return {
        "chunks": len(jobs),
        "bytes": int(sum(r.nbytes for r in stats)),
        "tables": len(tables),
    }
