"""Single-width epoch hunt: repeat the scaling job at ONE local[] width
to estimate its uncontended throughput (max over trials). Companion to
scaling.py when hypervisor epochs make paired invocations land unevenly
— the per-width maxima across hunts feed BENCH/BASELINE.md's
cross-sample best-of estimator.

Usage: python bench/wide_hunt.py [cpus=8] [n_events=16800000] [trials=5]
"""
import sys
import tempfile

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scaling import generate_input, run_level  # noqa: E402


def main() -> None:
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    n_events = int(sys.argv[2]) if len(sys.argv) > 2 else 16_800_000
    trials = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    root = tempfile.mkdtemp(prefix="widehunt-")
    generate_input(n_events, root)
    best = 0.0
    for t in range(trials):
        r = run_level(root, cpus, n_events, trial=t)
        best = max(best, r["events_per_sec"])
        print(
            f"trial {t}: {r['wall_sec']:.1f}s {r['events_per_sec']:,.0f} ev/s "
            f"steal {100 * r.get('steal_frac', 0):.1f}% gc {r.get('gc_sec', 0):.1f}s "
            f"batches {r['batch_wall_ms']}",
            flush=True,
        )
    print(f"BEST local[{cpus}]: {best:,.0f} ev/s")


if __name__ == "__main__":
    main()
