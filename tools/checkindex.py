"""CheckIndex CLI (index/CheckIndex.java tool analog).

Usage: python tools/checkindex.py <index_dir> [cpus]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lucene_spark.index import Index  # noqa: E402
from lucene_spark.index.check import check_index  # noqa: E402
from lucene_spark.session import get_spark  # noqa: E402

if __name__ == "__main__":
    idx_dir = sys.argv[1]
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("checkindex", cpus=cpus)
    report = check_index(Index(spark, idx_dir))
    print(json.dumps(report, indent=2))
    print("CheckIndex: OK")
