"""Distributed fsimage-decode probe: synthesize the reference's documented
large scale point (~20.3k dirs / 5.28M files, FsImageGenerator.java:47-53)
as a REAL binary image via extract/fsimage_writer.py, then time the
driver-side single-stream parse vs the executor-parallel decode
(load_fsimage distributed=True). Evidence for the BASELINE.md inodes/s row.

Usage: python scripts/fsimage_decode_probe.py [image_path]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hfsa_spark import get_spark
from hfsa_spark.extract.fsimage import load_fsimage_distributed, parse_fsimage
from hfsa_spark.extract.fsimage_writer import write_fsimage

ROOT_ID = 16385
TOP_DIRS = 25
SUB_DIRS = 800
FILES_PER_SUBDIR = 263  # 25*800*263 = 5.26M files
USERS = [f"user{i}" for i in range(10)]
GROUPS = [f"group{i}" for i in range(5)]
BLOCK = 128 * 1024 * 1024


def gen_rows():
    yield {"id": ROOT_ID, "parent_id": None, "name": "", "type": "DIRECTORY",
           "user": "hdfs", "group": "supergroup", "mode": 0o755, "mtime": 1700000000000}
    nid = ROOT_ID
    fid = 0
    for t in range(TOP_DIRS):
        nid += 1
        top = nid
        yield {"id": top, "parent_id": ROOT_ID, "name": f"top{t:02d}",
               "type": "DIRECTORY", "user": USERS[t % 10], "group": GROUPS[t % 5],
               "mode": 0o755, "mtime": 1700000000000 + t}
        for s in range(SUB_DIRS):
            nid += 1
            sub = nid
            yield {"id": sub, "parent_id": top, "name": f"sub{s:03d}",
                   "type": "DIRECTORY", "user": USERS[s % 10], "group": GROUPS[s % 5],
                   "mode": 0o755, "mtime": 1700000000000 + s}
            for f in range(FILES_PER_SUBDIR):
                nid += 1
                fid += 1
                size = (fid % 4096) * 65536  # mix of small and multi-block
                nblocks = max(1, (size + BLOCK - 1) // BLOCK)
                yield {
                    "id": nid, "parent_id": sub, "name": f"f{f:04d}.dat",
                    "type": "FILE", "user": USERS[fid % 10],
                    "group": GROUPS[fid % 5], "mode": 0o644,
                    "mtime": 1700000000000 + fid, "atime": 1700000000000 + fid,
                    "replication": 3, "preferred_block_size": BLOCK,
                    "blocks": [
                        (1073741825 + fid * 8 + b, 1001, min(size - b * BLOCK, BLOCK))
                        for b in range(nblocks)
                    ],
                }


def main() -> None:
    img = sys.argv[1] if len(sys.argv) > 1 else "/tmp/hfsa_probe_5m.img"
    n_inodes = 1 + TOP_DIRS + TOP_DIRS * SUB_DIRS * (1 + FILES_PER_SUBDIR)
    out: dict = {"n_inodes": n_inodes}

    if not os.path.exists(img):
        t0 = time.perf_counter()
        write_fsimage(
            img, gen_rows(),
            string_table=["hdfs", "supergroup", *USERS, *GROUPS],
            num_inodes=n_inodes,
            last_inode_id=ROOT_ID + n_inodes - 1,
        )
        out["write_sec"] = round(time.perf_counter() - t0, 2)
    out["image_bytes"] = os.path.getsize(img)

    t0 = time.perf_counter()
    rows = parse_fsimage(img)
    driver_sec = time.perf_counter() - t0
    out["driver_parse_sec"] = round(driver_sec, 2)
    out["driver_inodes_per_sec"] = int(len(rows) / driver_sec)
    del rows

    spark = get_spark("fsimage_decode_probe")
    # apples-to-apples with parse_fsimage: decode + parent wiring, no path
    # materialization (that is shared downstream work for both paths)
    for attempt in range(2):  # min-of-2: steady state past codegen warm-up
        t0 = time.perf_counter()
        n = load_fsimage_distributed(spark, img).count()
        el = time.perf_counter() - t0
        out["distributed_sec"] = round(min(out.get("distributed_sec", el), el), 2)
    assert n == n_inodes, (n, n_inodes)
    out["distributed_inodes_per_sec"] = int(n_inodes / out["distributed_sec"])
    out["speedup"] = round(out["driver_parse_sec"] / out["distributed_sec"], 1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
