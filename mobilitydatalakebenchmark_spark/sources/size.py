"""S15: storage size metric — sum of file sizes under a table directory
(reference ``apache_parquet.py:139-140``, ``benchmark.py:59-62``)."""

from __future__ import annotations

import os


def dir_size(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        for name in files:
            if name.startswith(("_", ".")):
                continue  # spark metadata (_SUCCESS, .crc)
            total += os.path.getsize(os.path.join(root, name))
    return total
