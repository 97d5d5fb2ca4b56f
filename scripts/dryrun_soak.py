"""Dryrun soak: N consecutive dryrun_multichip(8) runs, tallying how many
complete with zero child retries (round-3 VERDICT #9: "stays green" must be
a pass-rate, not one observed coin flip).

Each run invokes __graft_entry__.dryrun_multichip(8) in its own subprocess
(exactly what the driver executes) and counts a run as:
  clean        — exit 0 and no "[dryrun] ... attempt 1" retry note on stderr
  needed-retry — exit 0 but at least one per-axis child was retried
  failed       — nonzero exit

Usage: python scripts/dryrun_soak.py [N]     (default 5)
Prints one JSON summary line; exits nonzero if any run failed.
"""

import json
import os
import subprocess
import sys
import time


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    here = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    clean, retried, failed = 0, 0, 0
    per_run = []
    for i in range(n):
        t0 = time.time()
        r = subprocess.run(
            [sys.executable, "-c",
             "from __graft_entry__ import dryrun_multichip; "
             "dryrun_multichip(8)"],
            cwd=here, capture_output=True, text=True, timeout=3600)
        dt = round(time.time() - t0, 1)
        retries = r.stderr.count("attempt 1 rc=")
        if r.returncode != 0:
            failed += 1
            status = "failed"
            sys.stderr.write(r.stdout[-2000:] + r.stderr[-4000:])
        elif retries:
            retried += 1
            status = f"needed-retry x{retries}"
        else:
            clean += 1
            status = "clean"
        per_run.append({"run": i + 1, "status": status, "seconds": dt})
        print(f"# run {i + 1}/{n}: {status} ({dt}s)", file=sys.stderr,
              flush=True)
    print(json.dumps({
        "metric": "dryrun_multichip_soak",
        "runs": n, "clean": clean, "needed_retry": retried,
        "failed": failed, "per_run": per_run,
    }))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
