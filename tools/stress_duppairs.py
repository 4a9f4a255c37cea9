"""Stress repro for the driver's intermittent minhash/simhash err:
run both queries under driver-like conditions (num_cpus=32) across a
sweep of override_num_blocks, several iterations each, and print any
exception in full.  Usage:
    python tools/stress_duppairs.py [iters] [sf_dir]
"""
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ITERS = int(sys.argv[1]) if len(sys.argv) > 1 else 2
SF_DIR = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"


def main():
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=32, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e
    qs = e.queries()
    fails = 0
    for nb in ("", "1", "7", "64"):
        os.environ["PSR_NUM_BLOCKS"] = nb
        for it in range(ITERS):
            for name in ("minhash_dup_pairs", "simhash_dup_pairs"):
                try:
                    out = qs[name](SF_DIR)
                    n = out.num_rows if hasattr(out, "num_rows") else len(out)
                    print(f"nb={nb or 'auto':>4} it={it} {name}: "
                          f"{n} rows", flush=True)
                except Exception:
                    fails += 1
                    print(f"nb={nb or 'auto':>4} it={it} {name}: FAIL",
                          flush=True)
                    traceback.print_exc()
    os.environ.pop("PSR_NUM_BLOCKS", None)
    print(f"fails={fails}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
