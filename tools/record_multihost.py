"""Record the multi-host rehearsal as a driver-visible round artifact.

VERDICT r2 item 8: the driver only exercises `dryrun_multichip`; the 2x4
gloo multi-host rehearsal (`__graft_entry__.dryrun_multihost` — a REAL
2-process jax.distributed cluster on CPU whose training loss must match the
single-process reference to 1e-5) ran only inside pytest, leaving no round
artifact. This runs it and writes MULTIHOST_r{N}.json next to the driver's
MULTICHIP_r{N}.json.

Usage: python tools/record_multihost.py [round_number]
"""

from __future__ import annotations

import io
import json
import os
import sys
import traceback
from contextlib import redirect_stdout

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    out_path = os.path.join(REPO, f"MULTIHOST_r{rnd:02d}.json")
    rec: dict = {"n_processes": 2, "n_local_devices": 4, "ok": False}
    buf = io.StringIO()
    try:
        import __graft_entry__

        with redirect_stdout(buf):
            __graft_entry__.dryrun_multihost(2, 4)
        rec["ok"] = True
    except Exception:
        rec["error"] = traceback.format_exc()[-2000:]
    rec["tail"] = buf.getvalue()[-2000:]
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(rec["tail"].strip() or rec.get("error", ""))
    print(f"wrote {out_path} (ok={rec['ok']})")
    return 0 if rec["ok"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
