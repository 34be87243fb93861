#!/usr/bin/env python3
"""Smoke runner (reference test.py parity): executes a headless render and
extracts the timing summary line. Exit 0 iff the render completed and
produced finite output."""

import io
import re
import sys
from contextlib import redirect_stdout


def main() -> int:
    scene = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/resources/Box.glb"
    from vk_gltf_renderer_tpu.headless import main as headless

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = headless(
            ["--scenefile", scene, "--headless", "--size", "64", "64",
             "--frames", "3", "--ptSamples", "1", "--ptDepth", "3"]
        )
    out = buf.getvalue()
    sys.stdout.write(out)
    if rc != 0:
        print("SMOKE FAIL: headless returned", rc)
        return 1
    m = re.search(r"HEADLESS_SUMMARY .*", out)
    if not m:
        print("SMOKE FAIL: no summary line")
        return 1
    print("SMOKE OK:", m.group(0))
    return 0


if __name__ == "__main__":
    sys.exit(main())
