#!/usr/bin/env python3
"""Reference-STYLE compaction baseline for the throughput comparison.

A from-the-behavioral-spec reimplementation of what the reference does
per leaf (single process, single thread): stream a union of the input
files in 1M-row pandas chunks, write each chunk as one snappy parquet
file, delete the originals (SURVEY.md §2.1 O7/O9 semantics; no code is
taken from the reference). Used only to produce the "single-node
reference-style throughput" number that graft.CompactBench is compared
against.

Usage: python3 tools/reference_style_compact.py <root>
Emits one JSON line: {"metric":"ref_compact_sec", ...}
"""
import json
import os
import sys
import time
import uuid

import pyarrow.dataset as pads
import pyarrow.parquet as pq

CHUNK_ROWS = 1_000_000


def leaves(root):
    for dirpath, _dirnames, filenames in os.walk(root):
        files = [os.path.join(dirpath, f) for f in filenames if f.endswith(".parquet")]
        if len(files) > 1:
            yield dirpath, sorted(files)


def compact_leaf(dirpath, files):
    ds = pads.dataset(files, format="parquet")
    out = 0
    # chunked union read -> chunked writes
    scanner = ds.scanner(batch_size=CHUNK_ROWS)
    rows = 0
    buf = []
    buf_rows = 0
    import pyarrow as pa

    def flush():
        nonlocal buf, buf_rows, out
        if not buf:
            return
        table = pa.Table.from_batches(buf)
        name = os.path.join(dirpath, f"data_{uuid.uuid4().hex}.parquet")
        pq.write_table(table, name, compression="snappy")
        out += 1
        buf, buf_rows = [], 0

    for batch in scanner.to_batches():
        # flush BEFORE exceeding the cap — appending first could emit a
        # ~2x-CHUNK_ROWS file, unlike the reference's chunked read
        if buf_rows and buf_rows + batch.num_rows > CHUNK_ROWS:
            flush()
        buf.append(batch)
        buf_rows += batch.num_rows
        rows += batch.num_rows
        if buf_rows >= CHUNK_ROWS:
            flush()
    flush()
    # reference semantics: originals are deleted only after output exists
    # (its failure mode is duplication, never loss)
    if out > 0:
        for f in files:
            os.remove(f)
    return rows, out


def main(root):
    t0 = time.time()
    total_rows = 0
    files_in = 0
    files_out = 0
    n_leaves = 0
    for dirpath, files in list(leaves(root)):
        files_in += len(files)
        rows, out = compact_leaf(dirpath, files)
        total_rows += rows
        files_out += out
        n_leaves += 1
    sec = time.time() - t0
    print(json.dumps({
        "metric": "ref_compact_sec", "value": sec, "unit": "sec",
        "files_in": files_in, "files_out": files_out,
        "rows": total_rows, "leaves": n_leaves,
    }))


if __name__ == "__main__":
    main(sys.argv[1])
