"""Dump explain('formatted') for each headline bench query to
plans/r06/<query>_<tag>.txt.  Usage: python tools/dump_plans_r6.py <tag>"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")
TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")


def main():
    import bench
    from open_vector_tile_spark.plans import get_spark

    spark = get_spark("plans-r6", cores=32)
    out_dir = "/root/repo/plans/r06"
    os.makedirs(out_dir, exist_ok=True)
    for name, fn in bench.build_queries(spark, SF).items():
        df = fn()
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        with open(f"{out_dir}/{name}_{TAG}.txt", "w") as f:
            f.write(txt)
        print("wrote", name)
    spark.stop()


if __name__ == "__main__":
    main()
