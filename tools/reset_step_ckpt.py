#!/usr/bin/env python3
"""Rewrite a checkpoint with step=0 into a new snapshot dir (warm restart).

`pyrapose train --snapshot CKPT` (without --auto-resume) already does a
warm start by resetting the step counter in memory, but a --supervise
crash-restart before the first save would fall back to the ORIGINAL
checkpoint with its step intact and silently resume the OLD schedule.
Seeding the new run dir with a step-0 copy lets the run use plain
--auto-resume from the start: every (re)start resolves to this dir's own
newest checkpoint and the fresh schedule is unambiguous.

Usage: python tools/reset_step_ckpt.py SRC_CKPT DST_DIR
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    src, dst = sys.argv[1], sys.argv[2]
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import orbax.checkpoint as ocp

    payload = ocp.PyTreeCheckpointer().restore(src)
    payload["step"] = np.zeros_like(np.asarray(payload["step"]))
    os.makedirs(dst, exist_ok=True)
    path = os.path.abspath(os.path.join(dst, "step_00000000"))
    ocp.PyTreeCheckpointer().save(path, payload, force=True)
    print(f"wrote {path} (step reset from {src})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
