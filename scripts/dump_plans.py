#!/usr/bin/env python
"""Dump .explain("formatted") for named queries to plans/r11/<q>_<tag>.txt."""
import io, os, sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

def main():
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    import __spark_entry__ as entrymod
    from gordo_spark import get_spark
    spark = get_spark("gordo_spark_plans")
    qs = entrymod.queries()
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        out = os.path.join(here, "plans", "r12", f"{name}_{tag}.txt")
        with open(out, "w") as f:
            f.write(buf.getvalue())
        print("wrote", out, flush=True)

if __name__ == "__main__":
    main()
